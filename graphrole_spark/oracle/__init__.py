"""Pure-numpy oracle re-implementing the reference semantics.

scipy/sklearn are not installed in this environment, so the reference
library (dkaslovsky/GraphRole) cannot run here; this package is an
independent re-implementation of its *semantics*, validated against the
golden literals in the reference's test suite. It serves two purposes:

1. the ``numpy.allclose`` correctness target for the Spark engine, and
2. the shared driver-side math (log-binning on histograms, 1-D
   Lloyd-Max quantization, NMF) that the distributed operators reuse.
"""
