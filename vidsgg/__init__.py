"""vidsgg — a TPU-native Video Scene Graph Generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
J-PARK11/Learning-Temporal-Consistency-for-Video-Scene-Graph-Generation
(reference mounted read-only at /root/reference):

* Action Genome VidSGG in three regimes: predcls / sgcls / sgdet.
* Two relation decoders: TEMPURA (STTran + GMM heads + memory debiasing)
  and TEAT-GT (temporal-edge-augmented TokenGT graph transformer with a
  temporal-consistency regularizer).
* Recall@K / meanRecall@K evaluation under with/semi/no constraint, plus
  the temporal-consistency score.

Design: everything on the device path is statically shaped, padded and
masked (no data-dependent Python control flow under jit); attention is
computed as masked dense attention so the MXU sees large batched matmuls;
scaling is expressed through ``jax.sharding.Mesh`` + pjit data parallelism
rather than any torch/NCCL-style runtime.
"""

__version__ = "0.1.0"
