"""unav_yolyolva_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for dense
audio-visual event localization on untrimmed videos.

Re-implements, TPU-first, the full capability surface of the UnAV/yolyolVA
reference stack (Moohnai/UnAV_yolyolVA): feature ingestion, FCOS-style 1D
point label assignment, the alignment + YOLO-World-PAFPN fusion dual-stream
temporal-pyramid model, focal/DIoU/contrastive losses, EMA training, on-device
decode + Soft-NMS, and ActivityNet-style mAP evaluation.

Design stance (vs. the PyTorch reference):
  * channels-last (B, T, C) layout so the lane dimension maps onto the TPU
    VPU/MXU naturally;
  * label assignment, decoding and Soft-NMS are fixed-shape, fully-vectorized
    programs living inside one jitted step (no DataLoader worker hot loops,
    no CPU NMS round-trips);
  * data parallelism expressed with jax.sharding.Mesh + NamedSharding over a
    batch axis; XLA inserts the gradient all-reduce over ICI;
  * model state, optimizer state, EMA and the loss-normalizer EMA all live in
    a single TrainState pytree.
"""

__version__ = "0.1.0"
