"""run_scaling composes the reported pair from per-leg minima across
attempts — host noise only slows a run, so min-wall per leg is the least
contaminated estimate.  The previous policy (keep the whole attempt with
least total wall) preferred an attempt whose HI leg was contaminated over
one whose LO legs ran long; this test pins the composed behavior without
launching Ray (the four subprocess legs are faked)."""

import json
import types


def _fake_run_factory(script):
    """script: list of attempts, each a dict leg -> payload dict.
    Legs launch in order lo, hi, mlo, mhi."""
    state = {"i": 0}
    order = ("lo", "hi", "mlo", "mhi")

    def fake_run(argv, capture_output, text, env, check):
        k = state["i"]
        state["i"] += 1
        attempt, leg = divmod(k, 4)
        payload = script[attempt][order[leg]]
        # sanity: the harness passes the right mode/cpus per leg
        mode = argv[2]
        assert mode == (
            "--headline-only" if order[leg] in ("lo", "hi") else "--minhash-probe"
        )
        expect_cpus = "4" if order[leg] in ("lo", "mlo") else "16"
        assert env["RAY_GRAFT_CPUS"] == expect_cpus
        return types.SimpleNamespace(stdout=json.dumps(payload) + "\n")

    return fake_run


def _headline(wall):
    return {"value": wall, "triples_per_sec": round(1_000_000 / wall, 1)}


def _minhash(wall):
    return {"value": wall, "docs_per_sec": round(50_000 / wall, 1)}


def test_scaling_composes_per_leg_minima(monkeypatch):
    import bench

    # attempt 1: fast total wall but HI legs contaminated -> eff 0.595
    # attempt 2: clean HI legs, slow LO legs -> eff 1.0 (gated, >=0.8, stops)
    script = [
        {
            "lo": _headline(100.0),
            "hi": _headline(42.0),
            "mlo": _minhash(100.0),
            "mhi": _minhash(42.0),
        },
        {
            "lo": _headline(120.0),
            "hi": _headline(30.0),
            "mlo": _minhash(120.0),
            "mhi": _minhash(30.0),
        },
    ]
    monkeypatch.setattr(bench, "corpus_path", lambda sf, replicas=1: "/tmp/x")
    monkeypatch.setattr(bench, "wait_quiet", lambda budget: 0.01)
    monkeypatch.setattr(bench.subprocess, "run", _fake_run_factory(script))
    monkeypatch.setenv("GRAFT_SCALING_ATTEMPTS", "3")

    out = bench.run_scaling("/root/testdata/sf0.1")

    assert out["attempts"] == 2  # attempt 2 is gated and >=0.8 -> early stop
    assert out["composed_per_leg"] is True
    # per-leg minima: lo=100 (attempt 1), hi=30 (attempt 2)
    assert out["queries"]["cube_validate_all@4cpus"] == 100.0
    assert out["queries"]["cube_validate_all@16cpus"] == 30.0
    # composed eff = (100/30)/4 = 0.833 — NOT attempt 1's 0.595 (which the
    # old least-total-wall policy would have kept: 284 s < 300 s total)
    assert out["scaling_efficiency"] == 0.833
    assert out["minhash_scaling_efficiency"] == 0.833
    assert out["probe_gated"] is True
    assert "probe_failed" not in out
    assert [h["probe_gated"] for h in out["attempt_history"]] == [True, True]


def test_scaling_marks_probe_failed_when_no_quiet_leg(monkeypatch):
    import bench

    script = [
        {
            "lo": _headline(100.0),
            "hi": _headline(40.0),
            "mlo": _minhash(100.0),
            "mhi": _minhash(40.0),
        }
    ] * 3
    monkeypatch.setattr(bench, "corpus_path", lambda sf, replicas=1: "/tmp/x")
    # probe never passes the threshold
    monkeypatch.setattr(
        bench, "wait_quiet", lambda budget: bench.PROBE_THRESHOLD_S * 10
    )
    monkeypatch.setattr(bench.subprocess, "run", _fake_run_factory(script))
    monkeypatch.setenv("GRAFT_SCALING_ATTEMPTS", "3")

    out = bench.run_scaling("/root/testdata/sf0.1")
    assert out["attempts"] == 3  # never gated -> no early stop
    assert out["probe_gated"] is False
    assert out["probe_failed"] is True
