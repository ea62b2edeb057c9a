"""Every shipped experiment preset loads and fully applies.

The presets in ``configs/`` are parity ports of the reference's 24 mmcv
recipes (``/root/reference/arguments/*.py``, consumed there by
``utils/params_utils.py:2-10``). Here they are plain-python dict overlays
consumed by ``d3gs_tpu.config.apply_config_file``. This test guards two
things: (1) each preset file execs and applies cleanly, and (2) every key
it sets names a real attribute on the target param group — a key that
``apply_config_file`` would silently drop is a test failure, not a no-op.
"""
import glob
import os

from d3gs_tpu import config as C

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = sorted(glob.glob(os.path.join(REPO, "configs", "*.py")))

GROUP_CLASSES = {
    "ModelParams": C.ModelParams,
    "PipelineParams": C.PipelineParams,
    "OptimizationParams": C.OptimizationParams,
}


def _load_ns(path):
    ns = {}
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), ns)
    return ns


def test_presets_exist():
    assert len(PRESETS) >= 23, f"expected the full preset set, got {PRESETS}"


def test_every_preset_applies_without_dropped_keys():
    for path in PRESETS:
        ns = _load_ns(path)
        groups = {
            "model": C.ModelParams(),
            "pipe": C.PipelineParams(),
            "opt": C.OptimizationParams(),
        }
        seen_any = False
        for cls_name, cls in GROUP_CLASSES.items():
            overrides = ns.get(cls_name)
            if overrides is None:
                continue
            seen_any = True
            probe = cls()
            for k, v in overrides.items():
                assert hasattr(probe, k), (
                    f"{os.path.basename(path)}: {cls_name}.{k} is not a "
                    f"field of {cls.__name__} — apply_config_file would "
                    f"silently drop it"
                )
        assert seen_any, f"{path} defines no param-group dicts"
        C.apply_config_file(path, groups)


def test_preset_values_land():
    # Spot-check a complex preset end-to-end through apply_config_file.
    path = os.path.join(
        REPO, "configs", "ode_batch10_complex_weightdecay_smallend.py")
    groups = {"model": C.ModelParams(), "opt": C.OptimizationParams()}
    C.apply_config_file(path, groups)
    assert groups["model"].is_ode is True
    assert groups["opt"].sequence_length == 15
    assert groups["opt"].num_cams_per_iter == 15
    assert groups["opt"].position_lr_final == 1e-08
    assert groups["opt"].weight_decay == 1e-05
