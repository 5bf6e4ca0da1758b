"""Ray Data pipeline stages: batch kernels (stateless map_batches fns)
and actor-pool callable classes (stateful, built once per worker)."""
