"""Reference-format checkpoint EXPORT round-trip.

test_reference_ckpt_interop.py proves we can READ the reference's torch
checkpoints (forward converters validated against reference-generated
fixtures). This closes the loop in the other direction: models trained
here export to the reference's torch layout
(``TrainerX.export_reference_checkpoint`` + per-trainer
``convert_to_reference_state``), written under the reference's
registered model names, loadable by Dassl's
``load_checkpoint`` + ``load_state_dict(strict=False)``
(reference ``coop.py:330-343``) — so a reference user can evaluate
models trained on TPU here.

The gate: export a trained state, then load the exported torch file
back through OUR torch-reading path (which applies the same forward
converters the reference-fixture tests pin) and require parameter
equality. inverse o forward == identity through the torch format.
"""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def _build(name, tmp_path, seed=1, **tcfg):
    from helpers import build_synthetic_trainer

    return build_synthetic_trainer(
        name, tmp_path / "data", seed=seed,
        output_dir=tmp_path / "out", num_shots=2, trainer_cfg=tcfg)


CASES = [
    ("CoOp", dict(N_CTX=2)),
    ("CoCoOp", dict(N_CTX=2)),                      # meta_net Linears
    ("MaPLe", dict(N_CTX=2, PROMPT_DEPTH=2)),       # coupled projections
    ("PromptSRC", dict(N_CTX_TEXT=2, N_CTX_VISION=2,
                       PROMPT_DEPTH_TEXT=2, PROMPT_DEPTH_VISION=2)),
    ("VPT", dict(N_CTX_VISION=2, PROMPT_DEPTH_VISION=2)),
    ("CLIP_Adapter", dict()),                       # fc.{0,2} weights
    ("TaskRes", dict()),                            # residuals
    ("ProDA", dict(N_CTX=2, N_PROMPT=4, PROMPT_BS=2)),
]


def test_tempscaling_export_roundtrip(tmp_path, monkeypatch):
    """Calibrated checkpoints export to the reference ScaleLearner
    layout (param ``logit_scale``) and load back."""
    import jax.numpy as jnp
    import torch
    from clip_calibration_tpu.serving import build_serving_trainer

    FIX = osp.join(REPO, "tests", "fixtures", "golden_e2e")
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", osp.join(FIX, "weights"))
    opts = ["CALIBRATION.SCALING.BASE_LEARNER", "CoOp",
            "CALIBRATION.SCALING.BASE_DIR", osp.join(FIX, "coop_model"),
            "CALIBRATION.SCALING.BASE_EPOCH", "3",
            "TRAINER.COOP.N_CTX", "4", "INPUT.SIZE", "(32, 32)",
            "MODEL.PRECISION", "fp32", "TRAINER.COOP.PREC", "fp32"]
    t = build_serving_trainer(["amber", "basalt"],
                              trainer_name="TempScaling",
                              backbone="ViT-Test", opts=opts)
    t._models["scale_learner"]["params"]["scale"] = jnp.asarray(
        1.234, jnp.float32)
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    ck = torch.load(paths[0], map_location="cpu", weights_only=False)
    assert "logit_scale" in ck["state_dict"]  # reference naming
    # the reference registers the scaler as "tempscaling" (reference
    # tempscaling.py:111) and its load_model joins <dir>/<name>/<file>
    # — the export dir must use that name or the reference can't see it
    assert osp.basename(osp.dirname(paths[0])) == "tempscaling"

    # loading back from `exported` is exactly the reference-layout case:
    # a torch file under tempscaling/, found via the alias search
    t2 = build_serving_trainer(["amber", "basalt"],
                               trainer_name="TempScaling",
                               backbone="ViT-Test", opts=opts)
    t2.load_model(exported, epoch=1)
    assert float(np.asarray(
        t2._models["scale_learner"]["params"]["scale"])) == \
        pytest.approx(1.234, abs=1e-6)


@pytest.mark.parametrize("name,tcfg", CASES,
                         ids=[c[0] for c in CASES])
def test_export_roundtrip(name, tcfg, tmp_path):
    import torch

    t = _build(name, tmp_path, **tcfg)
    native = str(tmp_path / "native")
    t.save_model(0, native)           # epoch 1 files
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    assert paths and all(osp.exists(p) for p in paths)

    # the exported file is a genuine torch pickle with dotted fp32 keys
    ck = torch.load(paths[0], map_location="cpu", weights_only=False)
    assert set(ck) >= {"state_dict", "epoch"} and ck["epoch"] == 1
    assert all(isinstance(v, torch.Tensor) and v.dtype == torch.float32
               for v in ck["state_dict"].values())
    assert all("/" not in k for k in ck["state_dict"])

    # round trip: a FRESH differently-seeded trainer must recover the
    # original parameters from the exported torch files via the same
    # forward converters the reference-fixture tests validate
    t2 = _build(name, tmp_path, seed=2, **tcfg)
    t2.load_model(exported, epoch=1)
    from clip_calibration_tpu.models.weights import flatten_params

    for mname in t.get_model_names():
        flat_a = {k: np.asarray(v, np.float32) for k, v in
                  flatten_params(t.model_params(mname)).items()}
        flat_b = {k: np.asarray(v, np.float32) for k, v in
                  flatten_params(t2.model_params(mname)).items()}
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(
                flat_b[k], flat_a[k], rtol=1e-6, atol=1e-6,
                err_msg=f"{name}:{mname}:{k}")


def test_export_from_reference_layout_passes_through(tmp_path):
    """Export pointed at a directory that already holds REFERENCE-layout
    torch checkpoints (a supported load_model input, possibly under the
    reference's registered dir name) must pass the state through instead
    of crashing in the inverse hook — and must resolve the source
    through the same checkpoint_dir_aliases load_model uses."""
    import torch

    t = _build("MaPLe", tmp_path, N_CTX=2, PROMPT_DEPTH=2)
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    t.export_reference_checkpoint(native, exported, epoch=1)
    # `exported` now holds torch files under the reference dir name
    # (MultiModalPromptLearner) — exporting FROM it must work
    again = str(tmp_path / "again")
    paths = t.export_reference_checkpoint(exported, again, epoch=1)
    assert paths and all(osp.exists(p) for p in paths)
    a = torch.load(osp.join(exported, "MultiModalPromptLearner",
                            "model.pth.tar-1"),
                   map_location="cpu", weights_only=False)
    b = torch.load(paths[0], map_location="cpu", weights_only=False)
    assert set(a["state_dict"]) == set(b["state_dict"])
    for k in a["state_dict"]:
        np.testing.assert_array_equal(a["state_dict"][k].numpy(),
                                      b["state_dict"][k].numpy())
