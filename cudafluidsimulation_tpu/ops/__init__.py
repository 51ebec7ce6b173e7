"""Op backends: ``ref`` (pure-jnp oracle) and ``pallas`` (fused TPU kernels).

Use :func:`cudafluidsimulation_tpu.ops.backend.get_ops` to resolve a backend.
"""
