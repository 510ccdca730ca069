"""Pure-Python semantic kernels (no Spark imports; executor-shippable)."""
