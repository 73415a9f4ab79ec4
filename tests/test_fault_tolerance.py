"""Worker-death resilience: the property a 100 TB run actually needs —
a map_batches stage whose worker process dies mid-task must be retried
by Ray with NO rows lost or duplicated. (A Python exception in a UDF
aborts the dataset by design; this is the hard-death path: OOM-killer,
preemption, node loss.) Uses the stateless-task path, where Ray's
transparent task retry (max_retries) is the recovery mechanism — the
same mechanism that re-runs a lost block on another node in a real
cluster.
"""

import os

import pandas as pd

import ray
import ray.data


def _die_once_fn(marker: str):
    """Batch fn that hard-kills its worker process the first time it
    runs anywhere (marker file = at-most-one death per test run); every
    retry and every other worker computes normally."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("died")
            os._exit(1)
        out = df.copy()
        out["y"] = out["id"] * 2
        return out

    return fn


def test_map_batches_survives_worker_death(tmp_path):
    marker = str(tmp_path / "die_once")
    ds = ray.data.range(1000, override_num_blocks=8).map_batches(
        _die_once_fn(marker),
        batch_format="pandas",
    )
    out = ds.to_pandas()
    assert os.path.exists(marker), "the fault was never injected"
    assert len(out) == 1000  # no lost or duplicated rows
    assert int(out["y"].sum()) == 2 * sum(range(1000))
    assert sorted(out["id"]) == list(range(1000))
