"""Per-stage run metrics: rows in/out, dropped rows, batches, bytes.

The reference silently swallows per-feature errors and drops rows
(SpaVectors.py:808-812); the engine keeps that row-level policy but
COUNTS it (SURVEY.md §4 retries row). Counters live in one named
detached-scope actor so any task/actor worker can increment them;
reads happen on the driver after a run.

Usage::

    from spapy_ray.state import metrics
    ds = ds.map_batches(metrics.counted("geocode", geocode_batch),
                        batch_format="pyarrow")
    ...consume...
    print(metrics.snapshot())     # {'geocode': {'rows_in': ..., ...}}
"""

from __future__ import annotations

import pyarrow as pa

_ACTOR_NAME = "spapy_ray_metrics"


def _actor():
    import ray

    @ray.remote(num_cpus=0)
    class MetricsActor:
        def __init__(self):
            self.counters: dict[str, dict[str, int]] = {}

        def add(self, stage: str, **deltas: int) -> None:
            c = self.counters.setdefault(
                stage, {"rows_in": 0, "rows_out": 0, "rows_dropped": 0,
                        "batches": 0})
            for k, v in deltas.items():
                c[k] = c.get(k, 0) + int(v)

        def snapshot(self) -> dict:
            return {k: dict(v) for k, v in self.counters.items()}

        def reset(self) -> None:
            self.counters.clear()

    try:
        return ray.get_actor(_ACTOR_NAME)
    except ValueError:
        try:
            return MetricsActor.options(name=_ACTOR_NAME, lifetime="detached",
                                        get_if_exists=True).remote()
        except TypeError:  # older ray without get_if_exists
            return MetricsActor.options(name=_ACTOR_NAME).remote()


def counted(stage: str, fn):
    """Wrap a batch fn so rows in/out/dropped are counted per call.

    Fire-and-forget increments (remote call, never awaited in the hot
    path) — metric writes cost one tiny RPC per batch.
    """

    def wrapper(batch: pa.Table) -> pa.Table:
        out = fn(batch)
        a = _actor()
        n_in = len(batch)
        n_out = len(out)
        a.add.remote(stage, rows_in=n_in, rows_out=n_out,
                     rows_dropped=max(n_in - n_out, 0), batches=1)
        return out

    return wrapper


def snapshot() -> dict:
    import ray

    try:
        return ray.get(_actor().snapshot.remote())
    except Exception:
        return {}


def reset() -> None:
    import ray

    try:
        ray.get(_actor().reset.remote())
    except Exception:
        pass
