"""JAX / Pallas device kernels (batched over blocks).

Every op takes a *batch* of blocks — shape [B, ...] — because TPU throughput
comes entirely from batch width: serial coder chains run as lax loops whose
bodies are vectorized across the block dimension.
"""
