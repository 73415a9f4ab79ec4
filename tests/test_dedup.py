

def test_dup_span_coverage_semantics(ray_session):
    import pandas as pd
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.dedup import dup_span_coverage

    shared = "a b c d e f g h"          # one 8-gram, shared by docs 1 and 2
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                shared + " tail1 x y z",            # dup window at pos 1
                "head2 " + shared,                   # dup window at pos 2
                "unique tokens only nothing here repeats at all ok",
                "short doc",                         # < 8 tokens: no shingles
            ],
        }
    )
    out = (
        dup_span_coverage(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_tokens"] == 12
    assert out.loc[1, "n_dup_pos"] == 1
    assert out.loc[1, "covered_tokens"] == 8
    assert out.loc[2, "n_dup_pos"] == 1 and out.loc[2, "covered_tokens"] == 8
    assert out.loc[3, "n_dup_pos"] == 0 and out.loc[3, "covered_tokens"] == 0
    assert out.loc[4, "n_tokens"] == 2 and out.loc[4, "covered_tokens"] == 0


def test_dup_span_coverage_overlapping_windows(ray_session):
    import pandas as pd
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.dedup import dup_span_coverage

    # doc 1 repeats a 9-token phrase from doc 2 → two overlapping dup
    # 8-gram windows at pos p, p+1 → union covers 9 tokens, not 16
    phrase = "p q r s t u v w x"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["lead " + phrase + " trail", phrase],
        }
    )
    out = (
        dup_span_coverage(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_dup_pos"] == 2
    assert out.loc[1, "covered_tokens"] == 9
    assert out.loc[2, "n_dup_pos"] == 2 and out.loc[2, "covered_tokens"] == 9


def test_dup_span_coverage_no_dups(ray_session):
    import pandas as pd
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.dedup import dup_span_coverage

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta iota",
                "one two three four five six seven eight nine",
            ],
        }
    )
    out = dup_span_coverage(ray.data.from_pandas(docs)).to_pandas()
    assert (out["n_dup_pos"] == 0).all() and (out["covered_tokens"] == 0).all()


def test_latest_snapshot_semantics(ray_session):
    import pandas as pd
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.dedup import latest_snapshot

    corpus = pd.DataFrame(
        {
            "repo": ["r1", "r1", "r1", "r2"],
            "path": ["a.py", "a.py", "b.py", "a.py"],
            "commit": ["001", "002", "001", "005"],
            "lang": ["python"] * 4,
            "content": ["old", "new", "only", "other-repo"],
        }
    )
    out = (
        latest_snapshot(ray.data.from_pandas(corpus))
        .to_pandas()
        .sort_values(["repo", "path"], ignore_index=True)
    )
    assert list(out["content"]) == ["new", "only", "other-repo"]
    assert list(out["commit"]) == ["002", "001", "005"]


def test_ppjoin_matches_bruteforce():
    import itertools

    import pandas as pd
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.dedup import (
        _md5_u64,
        ppjoin_pairs,
        shingle_set,
    )

    texts = {
        0: "the quick brown fox jumps over the lazy dog again and again",
        1: "the quick brown fox jumps over the lazy cat again and again",
        2: "completely different content with no overlap at all here now",
        3: "the quick brown fox jumps over the lazy dog again and again",
        4: "short text",
    }
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        )
    )
    got = sorted(
        map(
            tuple,
            ppjoin_pairs(docs, threshold_num=5, threshold_den=10)
            .to_pandas()
            .to_numpy(),
        )
    )

    mask = (1 << 61) - 1
    sets = {
        i: {_md5_u64(s) & mask for s in shingle_set(t, 3)}
        for i, t in texts.items()
    }
    want = sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if len(sets[a] & sets[b]) * 10 >= len(sets[a] | sets[b]) * 5
    )
    assert got == want and (0, 3) in got and (0, 2) not in got


def test_containment_pairs_directed():
    import pandas as pd
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.stages import dedup as D

    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lambda mu nu xi omicron pi"
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [small, big, "unrelated words only here"]}
    )
    out = (
        D.containment_pairs(
            rd.from_pandas(docs), threshold_num=8, threshold_den=10
        )
        .to_pandas()
        .set_index(["doc_id_a", "doc_id_b"])
    )
    # every shingle of the small doc appears in the big doc → 1.0 ppm
    assert out.loc[(1, 2), "containment_ppm"] == 1_000_000
    # the reverse direction is far below 8/10 (big has many extra
    # shingles), and the unrelated doc pairs with nothing
    assert (2, 1) not in out.index
    assert not [p for p in out.index if 3 in p]
