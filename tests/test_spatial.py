"""GSPMD spatial/batch partitioning: sharded inference == unsharded inference."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.parallel.mesh import data_mesh
from wt_pse_tpu.parallel.spatial import batch_sharded, spatial_sharded
from wt_pse_tpu.train.eval import make_predict_fn
from wt_pse_tpu.train.state import init_ensemble

pytestmark = pytest.mark.slow  # compile-heavy; scripts/test.sh default skips


def _setup(b=8, hw=64):
    cfg = ModelConfig.from_hparams(default_hparams("WT_PSE"))
    nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True),
            ShapeStudent(cfg))
    state, _ = init_ensemble(*nets, (b, hw, hw, 3), jax.random.PRNGKey(0))
    predict = make_predict_fn(*nets)
    variables = (state.od.variables, state.od_shape.variables,
                 state.oc.variables, state.oc_shape.variables)
    img = jnp.asarray(np.random.RandomState(0).rand(b, hw, hw, 3) * 2 - 1,
                      jnp.float32)
    return predict, variables, img


def test_spatial_sharded_matches_unsharded():
    predict, variables, img = _setup()
    base_od, base_oc = predict(*variables, img)
    mesh = data_mesh(8)
    sp = spatial_sharded(predict, mesh)
    od, oc = sp(*variables, img)
    np.testing.assert_allclose(np.asarray(od), np.asarray(base_od),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(base_oc),
                               rtol=1e-5, atol=1e-5)


def test_batch_sharded_matches_unsharded():
    predict, variables, img = _setup()
    base_od, base_oc = predict(*variables, img)
    mesh = data_mesh(8)
    bs = batch_sharded(predict, mesh)
    od, oc = bs(*variables, img)
    np.testing.assert_allclose(np.asarray(od), np.asarray(base_od),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(base_oc),
                               rtol=1e-5, atol=1e-5)
