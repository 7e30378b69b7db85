"""sgqn_carla_tpu — a TPU-native visual-generalization RL framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the SGQN-CARLA
research stack (pixel-based SAC and six SAC-derived algorithms — RAD, CURL,
PAD, SODA, DrQ, SVEA, SGQN — trained on DeepMind-Control-style environments
with distraction benchmarks, plus a CARLA-style driving environment).

Everything on the hot path — physics → render → distraction compositing →
frame stack → replay → augment → gradient update — is a pure function over
pytrees, `vmap`-ped over an env batch and shardable over a `jax.sharding.Mesh`.

Layout:
  core/      config, logging, RNG streams, checkpointing
  physics/   Featherstone rigid-body core + MJCF-subset domains (walker, ...)
  render/    analytic ray-cast renderer: RGB + depth + segmentation on device
  envs/      functional env API, distraction transforms, CARLA twin
  data/      on-device replay ring buffer, overlay/video datasets
  ops/       augmentations, guided backprop custom-VJP, Pallas kernels
  agents/    SAC + RAD/CURL/PAD/SODA/DrQ/SVEA/SGQN (flax)
  train/     train / train_carla / eval CLI drivers
  parallel/  device mesh + sharded train-step composition
"""

__version__ = "0.1.0"
