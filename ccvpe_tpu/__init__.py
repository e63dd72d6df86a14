"""ccvpe_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for convolutional
cross-view pose estimation, with the capabilities of tudelft-iv/CCVPE.

Subpackages:
    nn        core ops + EfficientNet-B0 backbone (NHWC, functional)
    models    the CVM model family (VIGOR / KITTI / OxfordRobotCar presets)
    ops       matching kernels (lax reference, einsum fast path, Pallas),
              on-device ground-truth synthesis, geometry
    io        torch checkpoint import, native checkpoint/resume
    data      dataset index parsing + input pipelines
    train     losses, train/eval steps, metrics
    parallel  mesh + sharding helpers
    eval      BASELINE config runner (python -m ccvpe_tpu.eval)

Modules:
    api        serving front door (load_model / predict / export_model)
    serve      HTTP pose service (python -m ccvpe_tpu.serve)
    visualize  qualitative rendering for all three datasets
"""

__version__ = "0.1.0"
