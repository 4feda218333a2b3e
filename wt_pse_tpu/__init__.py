"""wt_pse_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
tonyckc/WT-PSE-code (IEEE TMI 2024: "Learning Robust Shape Regularization for
Generalizable Medical Image Segmentation").

Not a port: the reference (PyTorch, single GPU, eager) is rebuilt TPU-first:

- the whole Fundus dataset lives in HBM; a single jitted 4-phase train step takes only
  sample indices and a PRNG key (reference: Python batch assembly + per-loss ``.item()``
  syncs per iteration, ``/root/reference/Trainer.py:762-924``),
- NHWC convolutions on the MXU, Flax modules whose parameter tree mirrors the reference
  state_dict names so the released ``.pth.tar`` imports mechanically,
- covariance/whitening + MMD losses as fused XLA (and Pallas) kernels
  (reference: ``algorithms.py:1277-1309``, ``algorithms.py:59-121``),
- data parallelism via ``shard_map`` over a ``jax.sharding.Mesh`` with per-domain
  chunks kept device-local (reference has no distributed path at all, SURVEY §2.3).

Subpackages
-----------
config    three-tier hyperparameter system (registry -> yaml -> CLI)
data      Fundus dataset + jit-compiled augmentation front-end
models    Flax networks: U-Net segmenter, DeepWT, teacher/student shape priors
ops       losses, resize-parity ops, post-processing, metrics, Pallas kernels
train     train state, the jitted 4-phase step, trainer/eval loops
parallel  mesh construction and shard_map data parallelism
io        orbax checkpoints + PyTorch .pth.tar importer
utils     logging, profiling, seeding
cli       train / test_visualization entry points (flag parity with the reference)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import wt_pse_tpu` free of jax import cost)."""
    _api = {
        "Trainer": ("wt_pse_tpu.train.trainer", "Trainer"),
        "WTPSE": ("wt_pse_tpu.models.wt_pse", "WTPSE"),
        "ShapeStudent": ("wt_pse_tpu.models.shape_prior", "ShapeStudent"),
        "TeacherShapePrior": ("wt_pse_tpu.models.shape_prior", "TeacherShapePrior"),
        "JointShapeReg": ("wt_pse_tpu.models.joint", "JointShapeReg"),
        "ModelConfig": ("wt_pse_tpu.models.common", "ModelConfig"),
        "load_fundus": ("wt_pse_tpu.data.fundus", "load_fundus"),
        "load_train_domains": ("wt_pse_tpu.data.fundus", "load_train_domains"),
        "default_hparams": ("wt_pse_tpu.config", "default_hparams"),
        "load_config": ("wt_pse_tpu.config", "load_config"),
        "load_reference_checkpoint": ("wt_pse_tpu.io.torch_import",
                                      "load_reference_checkpoint"),
        "load_predictor": ("wt_pse_tpu.api", "load_predictor"),
        "Predictor": ("wt_pse_tpu.api", "Predictor"),
    }
    if name in _api:
        import importlib

        mod, attr = _api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
