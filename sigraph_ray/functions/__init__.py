"""Pure, vectorized per-batch kernels. No Ray imports here."""
