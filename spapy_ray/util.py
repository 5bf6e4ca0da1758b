"""Small runtime helpers (no ray.init anywhere)."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """CPUs of the current Ray cluster (caller already holds a session;
    falls back when called before init, e.g. at import time)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def default_pool() -> int:
    """Default actor-pool size for map_batches stages: FIXED at the
    cluster CPU count. Two hard-won findings (BASELINE.md scaling
    notes):

    - Ray fuses upstream stateless maps into the pool, so an
      undersized pool caps the entire fused chain (a (1,8) pool made
      32 CPUs *slower* than 8);
    - an autoscaling (1, N) pool ramps up too slowly for short jobs —
      measured 5.2s wall for 11.9s of task work on 32 CPUs — while a
      FIXED pool equal to the cluster size deadlocks the upstream task
      operator (nothing left for ReadRange). (N/2, N) pre-starts half
      the cluster and leaves task slots free.
    """
    n = max(4, cluster_cpus())
    return (max(2, n // 2), n)


def chained_pools(k: int) -> tuple[int, int]:
    """Pool spec for ONE of ``k`` actor-pool stages chained in a
    single pipeline. Two default_pool() stages back to back deadlock:
    their pre-started minimums (N/2 each) claim every CPU and the
    upstream task operator (the read) gets nothing — measured hang on
    chained media stages. Splitting the cluster k ways keeps all
    stages runnable and leaves slack for task operators."""
    n = max(4, cluster_cpus())
    return (max(1, n // (2 * k)), max(2, n // k))


_STATE_CACHE: dict = {}


def cached_state(ref_box, builder):
    """Per-worker-process state for broadcast data in STATELESS tasks.

    ``ref_box`` is a 1-tuple holding a ray ObjectRef (boxed so Ray's
    argument resolution doesn't unbox it per task). The built state
    (e.g. a decoded STRtree index) is cached in the worker process
    keyed by the ref, so repeated tasks on the same worker skip both
    the ray.get and the build — the same amortization an actor gives,
    without paying actor-pool process startup per pipeline (measured
    ~7s for a 32-actor pool; see BASELINE.md).
    """
    ref = ref_box[0]
    key = (ref.hex() if hasattr(ref, "hex") else id(ref), id(builder))
    hit = _STATE_CACHE.get(key)
    if hit is None:
        import ray

        hit = builder(ray.get(ref))
        _STATE_CACHE[key] = hit
    return hit
