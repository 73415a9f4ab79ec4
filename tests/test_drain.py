"""Contracts of the one-session scheduling fix (util.drain_stale_pools /
_slot_capped): leaked Ray-Data-style pool actors must be waited out and,
past the grace period, force-killed; pool budgets must cap to genuinely
free slots.  These are the mechanisms that keep the driver's
back-to-back query execution deadlock-free (VERDICT r4 #1)."""

import time

import pytest

import ray

from nospa_rdf_data_cube_validator_ray import util


def _total_cpu():
    return float(ray.cluster_resources().get("CPU", 0))


def test_drain_noop_on_quiet_cluster():
    t0 = time.monotonic()
    assert util.drain_stale_pools() is True
    assert time.monotonic() - t0 < 1.0  # one available_resources call


def test_drain_force_kills_orphaned_pool_worker():
    """An actor whose class name matches Ray Data's pool-worker marks
    ("MapWorker"/"Aggregator") and that still holds a CPU slot past the
    grace period is force-killed; user actors with other names are NOT
    (they make drain time out instead)."""

    @ray.remote(num_cpus=1)
    class MapWorkerOrphanProbe:  # name contains the MapWorker mark
        def ping(self):
            return 1

    orphan = MapWorkerOrphanProbe.remote()
    ray.get(orphan.ping.remote())
    total = _total_cpu()
    assert float(ray.available_resources().get("CPU", 0)) < total

    t0 = time.monotonic()
    ok = util.drain_stale_pools(timeout=10.0, kill_after=1.0)
    assert ok, "drain did not reclaim the orphan's slot"
    assert float(ray.available_resources().get("CPU", 0)) == total
    assert time.monotonic() - t0 < 10.0
    with pytest.raises(ray.exceptions.RayActorError):
        ray.get(orphan.ping.remote())


def test_drain_leaves_user_actors_alone():
    @ray.remote(num_cpus=1)
    class InnocentUserActor:
        def ping(self):
            return 1

    a = InnocentUserActor.remote()
    ray.get(a.ping.remote())
    ok = util.drain_stale_pools(timeout=2.0, kill_after=0.5)
    assert ok is False  # times out rather than killing a user actor
    assert ray.get(a.ping.remote()) == 1  # still alive
    ray.kill(a)
    # wait for the slot to return so later tests see a quiet cluster
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if float(ray.available_resources().get("CPU", 0)) == _total_cpu():
            break
        time.sleep(0.1)


def test_slot_capped_budget_respects_held_slots():
    @ray.remote(num_cpus=2)
    class InnocentHolder:
        def ping(self):
            return 1

    a = InnocentHolder.remote()
    ray.get(a.ping.remote())
    total = int(_total_cpu())
    # budget demanding every CPU cannot be satisfied while 2 slots are
    # held by a non-pool actor → capped to free-minus-producer
    capped = util._slot_capped(total, wait=1.0)
    assert capped <= total - 2 - 1 + 1  # int(avail) - 1 with avail=total-2
    assert capped >= 2
    ray.kill(a)
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if float(ray.available_resources().get("CPU", 0)) == _total_cpu():
            break
        time.sleep(0.1)
    # quiet again: full budget passes through untouched
    assert util._slot_capped(max(2, total - 1), wait=1.0) == max(2, total - 1)
