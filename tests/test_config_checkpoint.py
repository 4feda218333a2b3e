"""Config system and checkpoint round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import Config, argv_update, default_hparams, load_config
from wt_pse_tpu.io.checkpoint import export_torch_state_dict, restore_ensemble, save_ensemble
from wt_pse_tpu.io.torch_import import convert_state_dict, load_into_variables


def test_default_hparams_wt_pse_block():
    hp = default_hparams("WT_PSE", "fundus")
    # the exact values the reference registry pins (hparams_registry.py:71-93)
    assert hp["whitening"] is True
    assert hp["shape_prior"] is True
    assert hp["shape_attention"] is True
    assert hp["cat_shape"] is False
    assert hp["shape_attention_coeffient"] == 0.3
    assert hp["margin"] == 0
    assert hp["instance_wt_gm"] == 1
    assert hp["domain_wt_gm"] == 1
    assert hp["multi-turn"] == 1
    assert hp["batch_size"] == 9


def test_joint_variant_disables_whitening():
    hp = default_hparams("Unet_nips2023_joint_shape_regularization")
    assert hp["whitening"] is False
    assert hp["instance_wt_gm"] == 0


def test_three_tier_merge(tmp_path):
    y1 = tmp_path / "a.yaml"
    y1.write_text("margin: 0.5\nextra_key: 1\n")
    y2 = tmp_path / "b.yaml"
    y2.write_text("margin: 0.7\n")
    cfg = load_config(default_hparams("WT_PSE"), [str(y1), str(y2)],
                      ["--margin", "0.9", "--multi-turn", "2"])
    assert cfg["margin"] == 0.9          # CLI beats yaml
    assert cfg["extra_key"] == 1         # yaml adds keys
    assert cfg["multi-turn"] == 2
    assert cfg.whitening is True         # attribute access


def test_argv_update_forms():
    cfg = Config({"a": 1})
    argv_update(cfg, ["--a=2", "--b.c", "3", "--flag"])
    assert cfg["a"] == 2 and cfg["b"]["c"] == 3 and cfg["flag"] is True


def test_perf_hparams_typed_through_cli_leftovers():
    """The perf knobs ride the CLI leftovers and must come back typed."""
    cfg = load_config(default_hparams("WT_PSE"), left_argv=[
        "--compute_dtype", "bfloat16", "--space_to_depth", "true",
        "--space_to_depth_levels", "2"])
    assert cfg["compute_dtype"] == "bfloat16"
    assert cfg["space_to_depth"] is True
    assert cfg["space_to_depth_levels"] == 2 and isinstance(
        cfg["space_to_depth_levels"], int)
    from wt_pse_tpu.models.common import ModelConfig

    mc = ModelConfig.from_hparams(cfg)
    assert mc.s2d and mc.s2d_levels == 2


def test_repair_left_argv(tmp_path):
    """argparse steals unknown flags' values into the configs positional; the
    CLI re-pairs them (see cli/train._repair_left_argv)."""
    from wt_pse_tpu.cli.train import _repair_left_argv

    yml = tmp_path / "o.yaml"
    yml.write_text("x: 1\n")
    left, configs = _repair_left_argv(
        ["--compute_dtype", "--margin=0.5", "--flag"],
        [str(yml), "bfloat16", "2"])
    assert left == ["--compute_dtype", "bfloat16", "--margin=0.5", "--flag", "2"]
    assert configs == [str(yml)]
    # no orphans -> untouched
    left, configs = _repair_left_argv(["--a=1"], [str(yml)])
    assert left == ["--a=1"] and configs == [str(yml)]
    # ambiguous: 2 dangling flags, 1 stolen value (a boolean flag would steal
    # the value) -> hard error: continuing would drop the value AND turn the
    # surviving value-less --key into boolean true, inverting the user's
    # explicit setting for the whole run
    with pytest.raises(SystemExit, match="ambiguous"):
        _repair_left_argv(["--some-flag", "--compute_dtype"], ["bfloat16"])


def test_main_accepts_argv_list(tmp_path, monkeypatch):
    """main() takes a Namespace (the sweep CLI's path) OR an argv list — the
    natural programmatic form; hparam leftovers parse out either way."""
    from wt_pse_tpu.cli import train as train_cli
    from wt_pse_tpu.utils import snapshot

    seen = {}

    class FakeTrainer:
        def __init__(self, **kw):
            seen.update(kw)

        def train(self):
            return [0.1] * 6

    monkeypatch.setattr(train_cli, "Trainer", FakeTrainer)
    monkeypatch.setattr(train_cli, "load_train_domains", lambda *a, **k: [])
    monkeypatch.setattr(train_cli, "load_fundus", lambda *a, **k: None)
    monkeypatch.setattr(snapshot, "save_code", lambda *a, **k: None)
    res = train_cli.main([
        "--label", "OC", "--out", str(tmp_path / "o"),
        "--running_times", "1", "--margin=0.5"])
    assert seen["label"] == "OC"
    assert seen["hparams"]["margin"] == 0.5
    assert res["DSC_OC"] == [0.1]


def test_running_times_seed_semantics(tmp_path, monkeypatch):
    """Documented deviation (cli/train.py): run r trains with seed+r so the
    reported std is real seed variance; --identical-reruns restores the
    reference's re-seed-identically semantics (train.py:53-54)."""
    from wt_pse_tpu.cli import train as train_cli
    from wt_pse_tpu.utils import snapshot

    seeds = []

    class FakeTrainer:
        def __init__(self, **kw):
            seeds.append(kw["seed"])

        def train(self):
            return [0.1] * 6

    monkeypatch.setattr(train_cli, "Trainer", FakeTrainer)
    monkeypatch.setattr(train_cli, "load_train_domains", lambda *a, **k: [])
    monkeypatch.setattr(train_cli, "load_fundus", lambda *a, **k: None)
    monkeypatch.setattr(snapshot, "save_code", lambda *a, **k: None)

    train_cli.main(["--out", str(tmp_path / "a"), "--running_times", "3",
                    "--seed", "5"])
    assert seeds == [5, 6, 7]
    seeds.clear()
    train_cli.main(["--out", str(tmp_path / "b"), "--running_times", "3",
                    "--seed", "5", "--identical-reruns"])
    assert seeds == [5, 5, 5]


@pytest.mark.slow  # full-ensemble init + orbax save/restore (~45s); scripts/test.sh --slow
def test_orbax_roundtrip(tmp_path):
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE
    from wt_pse_tpu.train.state import init_ensemble

    cfg = ModelConfig()
    nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True), ShapeStudent(cfg))
    state, _ = init_ensemble(*nets, (1, 32, 32, 3), jax.random.PRNGKey(0))
    path = str(tmp_path / "ck")
    save_ensemble(path, state)
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = restore_ensemble(path, zero)
    a = jax.tree.leaves(state.od.params)
    b = jax.tree.leaves(restored.od.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_torch_export_import_roundtrip():
    """flax -> torch-style state_dict -> converter -> identical flax tree."""
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.wt_pse import WTPSE

    m = WTPSE(ModelConfig())
    v = m.init({"params": jax.random.PRNGKey(3)}, jnp.zeros((1, 32, 32, 3)),
               jnp.zeros((1, 32, 32, 1)), method=WTPSE.initialize)
    sd = export_torch_state_dict(v)
    assert any(k.startswith("mu.0.") for k in sd)  # Sequential-index spelling
    assert any(".running_mean" in k for k in sd)
    conv = convert_state_dict(sd)
    v2, matched = load_into_variables(jax.tree.map(jnp.zeros_like, v), conv)
    assert len(matched) > 300
    for x, y in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(v2["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
