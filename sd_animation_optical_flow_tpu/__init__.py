"""sd_animation_optical_flow_tpu — TPU-native flow-guided animation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zyddnys/sd_animation_optical_flow (reference mounted at /root/reference):
video -> keyframe detection -> SD-1.5 img2img keyframes -> dense optical
flow + per-pixel confidence -> warp -> confidence-masked SD inpainting,
with ControlNet guidance and cross-frame self-attention K/V reuse.

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere; convs/matmuls sized for the MXU.
  * Pure-functional models: params are pytrees, forwards are jit/scan-safe.
  * Denoise loops are `lax.scan`s over precomputed per-step schedule arrays.
  * K/V capture/injection is explicit data flow (fixed-shape pytrees), not
    mutation (reference: ldm/modules/attention.py:353-369, openaimodel.py:79-90).
  * Scale-out via jax.sharding.Mesh + shard_map collectives, never host loops.
"""

__version__ = "0.1.0"
