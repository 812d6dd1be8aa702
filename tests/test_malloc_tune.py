"""The glibc malloc tunables are applied in every process that imports
cutwed_ray — the driver and, transitively, every Ray worker that unpickles
one of our stage functions (see cutwed_ray/_malloc.py for the why)."""
import ray

import cutwed_ray  # noqa: F401 - import applies the tunables
from cutwed_ray import _malloc


def test_applied_in_driver():
    assert _malloc._applied is True
    # idempotent
    assert _malloc.tune_malloc() is True


def test_applied_in_ray_worker(ray_session):
    @ray.remote(num_cpus=0)
    def probe() -> bool:
        from cutwed_ray import _malloc as m

        return m._applied

    assert ray.get(probe.remote()) is True
