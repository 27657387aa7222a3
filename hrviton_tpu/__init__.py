"""hrviton_tpu — a TPU-native (JAX/XLA/Pallas) high-resolution virtual try-on framework.

Capability parity target: sangyun884/HR-VITON (ECCV 2022), re-designed TPU-first:
  * NHWC layouts, bf16 compute / f32 params, static shapes, jit-compiled pipelines
  * data parallelism via `jax.sharding.Mesh` + GSPMD (cross-replica BatchNorm falls
    out of global-batch statistics under pjit — the TPU-native SyncBN)
  * torch-exact op semantics (grid_sample, interpolate, Gaussian blur) validated by
    golden tests against torch-CPU.

Layers (bottom-up): core (mesh/precision) -> ops (primitives) -> nn (layers) ->
models -> losses -> pipelines -> train/infer -> cli.
"""

__version__ = "0.1.0"
