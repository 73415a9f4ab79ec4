"""Sequence packing: assign every document a position in a fixed-size
token stream (GPT-style sample packing — concatenate the corpus in a
deterministic order and cut it into ``window``-token packs).

The core primitive is a **distributed ordered prefix-sum**, the classic
two-pass pattern:

  pass 1  sort by id (range partition), then ONE summary row per block
          (first id, block token total) — O(num_blocks) driver state,
          tiny at any corpus size;
  driver  exclusive scan over the (ordered) block summaries → a
          first_id → global_offset table, broadcast via ``ray.put``;
  pass 2  map_batches over the SAME materialized blocks: in-block
          cumulative sum + the block's broadcast offset.

No corpus-scale data ever reaches the driver, and the only exchange is
the sort (which a 100 TB run needs anyway to fix the pack order).  Both
passes run with ``batch_size=None`` so a batch == a block and the
summary keys line up.

The assignment is exactly reproducible in SQL as
``sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens`` — see
``_SQL_PACK_SEQUENCES`` in ``pipelines/training_data.py``.
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data

from ..functions.text import _TOKEN_RE


def pack_sequences(
    ds: "ray.data.Dataset",
    *,
    window: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-doc pack assignment over the doc_id-ordered token stream:
    returns ``(doc_id, n_tokens, start_tok, pack_id)`` where
    ``start_tok`` is the document's offset in the concatenated stream
    and ``pack_id = start_tok // window`` (documents may straddle pack
    boundaries, as in token-stream packing)."""

    def count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "n_tokens": df[text_col]
                .fillna("")
                .str.count(_TOKEN_RE)
                .astype("int64"),
            }
        )

    counted = (
        ds.map_batches(count, batch_format="pandas")
        .sort(id_col)
        .materialize()
    )

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        # map_batches never invokes the UDF on an empty block (see
        # util.heal_schema), so df is always non-empty here
        return pd.DataFrame(
            {"first_id": [int(df[id_col].iloc[0])],
             "total": [int(df["n_tokens"].sum())]}
        )

    sums = (
        counted.map_batches(summarize, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("first_id")
    )
    offsets = dict(
        zip(
            sums["first_id"].astype("int64"),
            sums["total"].cumsum().shift(fill_value=0).astype("int64"),
        )
    )
    ref = ray.put(offsets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref)[int(df[id_col].iloc[0])]
        n = df["n_tokens"].astype("int64")
        start = n.cumsum() - n + off
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_tokens": n,
                "start_tok": start.astype("int64"),
                "pack_id": (start // window).astype("int64"),
            }
        )

    return counted.map_batches(assign, batch_format="pandas", batch_size=None)


def global_rank(
    ds: "ray.data.Dataset",
    *,
    keys: list[str],
    descending: "list[bool] | bool" = False,
    out_col: str = "rank",
) -> "ray.data.Dataset":
    """Dense global 1-based row numbering over an arbitrary sort order —
    the same two-pass ordered prefix-sum as :func:`pack_sequences`, with
    the per-block summary keyed by the block's first sort-key tuple
    (unique because the sort is total when ``keys`` includes a
    tie-breaker column, which callers must ensure).

    The only exchange is the sort itself; per-block summaries are
    O(num_blocks) driver state and the offset table broadcasts once.
    """
    sorted_ds = ds.sort(keys, descending=descending).materialize()

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys].head(1).copy()
        out["_n"] = len(df)
        return out

    sums = (
        sorted_ds.map_batches(
            summarize, batch_format="pandas", batch_size=None
        )
        .to_pandas()
        .sort_values(
            keys,
            ascending=[not d for d in (
                descending if isinstance(descending, list)
                else [descending] * len(keys)
            )],
        )
    )
    offsets = dict(
        zip(
            (tuple(r) for r in sums[keys].itertuples(index=False)),
            sums["_n"].cumsum().shift(fill_value=0).astype("int64"),
        )
    )
    ref = ray.put(offsets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref)[tuple(df[keys].iloc[0])]
        out = df.copy()
        out[out_col] = pd.array(
            range(int(off) + 1, int(off) + 1 + len(df)), dtype="int64"
        )
        return out

    return sorted_ds.map_batches(
        assign, batch_format="pandas", batch_size=None
    )
