"""cfen_vit_tpu — TPU-native CFEN-ViT dehazing framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
phoenixtreesky7/CFEN-ViT-Dehazing (reference mounted at /root/reference):
a hierarchical local+global Vision Transformer U-Net performing intrinsic
image decomposition (reflectance / shading / dehazed) with complementary
feature selection (CFS) fusion, trained as a conditional GAN.

Design notes (vs the PyTorch reference):
  * the reference's 336 sequential per-tile LViT calls per forward
    (networks_iid_hlgvit_crs_gd4_cfs_v3.py:403-482 etc.) are a single
    batched block-attention per level here;
  * the whole haze->clean path compiles to one XLA program;
  * data parallelism is a jax.sharding.Mesh + jit, not DataParallel;
  * the dcn CUDA extension (dcn/src/*) is a Pallas gather-conv kernel.
"""

__version__ = "0.1.0"
