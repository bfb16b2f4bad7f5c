"""feartracker_tpu — a TPU-native (JAX/XLA/Pallas) single-object visual tracking
framework with the capabilities of PinataFarms/FEARTracker (ECCV 2022 "FEAR").

Layer map (mirrors the reference's, see SURVEY.md §1):
  core/      geometry, grids, box coding               (ref: model_training/utils/utils.py, dataset/box_coder.py)
  ops/       device crop engine, correlation, decode   (ref: host cv2 crops + torch ops; here: XLA/Pallas)
  models/    FBNet backbone, neck, BoxTower, FEARNet   (ref: model_training/model/)
  tracker/   online tracking runtime (scan, streams)   (ref: model_training/tracker/)
  data/      samplers, datasets, augmentations         (ref: model_training/dataset/)
  train/     loss, metrics, optax loop, callbacks      (ref: model_training/train/)
  parallel/  mesh, sharding, collectives               (ref: Lightning DDP / NCCL)
  config/    layered YAML composition                  (ref: Hydra configs)
  convert/   CoreML / Lightning checkpoint importers   (ref: evaluate/coreml_*.py, utils/torch.py)
  evaluate/  FPS protocols, FLOPs, GOT-10k eval        (ref: evaluate/, MeasurePerformance)
"""

__version__ = "0.1.0"
