"""Pure compute ops: schedulers, RNG, attention, chunk/blend kernels."""
