"""The glibc malloc tunables are applied in every process that imports
cutwed_ray — the driver and, transitively, every Ray worker that unpickles
one of our stage functions (see cutwed_ray/_malloc.py for the why)."""
import ray

import cutwed_ray  # noqa: F401 - import applies the tunables
from cutwed_ray import _malloc


def test_applied_in_driver():
    import pyarrow as pa

    assert _malloc._applied is True
    # idempotent
    assert _malloc.tune_malloc() is True
    # arrow default pool rerouted off jemalloc (which unmaps oversize
    # buffers on free -> per-batch refault storms on this host)
    assert pa.default_memory_pool().backend_name == "system"


def test_applied_in_ray_worker(ray_session):
    @ray.remote(num_cpus=0)
    def probe():
        import pyarrow as pa

        from cutwed_ray import _malloc as m

        return m._applied, pa.default_memory_pool().backend_name

    applied, backend = ray.get(probe.remote())
    assert applied is True
    assert backend == "system"
