"""TPU-native video anomaly detection framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
jinmang2/anomaly_detection_on_video (reference layout documented in SURVEY.md):

- ``ops``       fused preprocessing kernels (resize / ten-crop / standardize /
                loop-pad), metrics, Pallas kernels.
- ``models``    the model zoo: I3D (3D-ResNet50) feature extractors and the
                MGFN anomaly scorer, as Flax modules with pure jit-able apply
                functions (reference: src/i3d.py, src/models/mgfn/).
- ``data``      the data plane: on-disk feature contract ((n_clips, 10, 2048)
                clip features, (10, 32, 2048) segment features, frame-level GT
                JSON), host video decode, streaming host->device pipelines
                (reference: src/dataset.py, extract_features.py).
- ``training``  jit'd train/eval steps, optax optimizers, orbax checkpoints,
                metric loggers (reference: src/runner.py, run.py).
- ``parallel``  device-mesh construction and sharding rules (DP over MIL bags,
                clip-axis sharding for extraction) — new TPU-first design; the
                reference has no distributed code (SURVEY.md §2.2).
- ``config``    YAML config-group composition with CLI overrides, mirroring
                the reference's Hydra semantics (reference: configs/, run.py).
"""

__version__ = "0.1.0"
