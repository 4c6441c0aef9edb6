"""C12 host-loop hardening (VERDICT r1 weak #6): mixed-resolution datasets
through the train and test paths, and no silently-dropped tail batch.

Reference capability: SURVEY.md §2a C12 (finetune + classifier test); the
reference's DataLoader handles ragged resolutions via per-worker PIL, the
TPU-native build buckets per resolution (static shapes per XLA program).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from eov_tpu import train as tr
from eov_tpu.data.datasets import SyntheticVideoDataset


def _mixed_dataset():
    a = SyntheticVideoDataset(n_classes=3, clips_per_class=3, seed=0,
                              height=44, width=56, name="ma")
    b = SyntheticVideoDataset(n_classes=3, clips_per_class=2, seed=1,
                              height=56, width=44, name="mb")

    class Mixed:
        records = a.records + b.records
        class_names = a.class_names

        def get_frames(self, rec, idx):
            return (a if rec.video_id.startswith("ma") else b).get_frames(
                rec, idx
            )

    return Mixed()


def _tiny_cfg(**kw):
    base = dict(num_classes=3, num_segments=2, batch_clips=4,
                compute_dtype="float32", scale_size=36, crop_size=32,
                dropout=0.0)
    base.update(kw)
    return tr.TrainConfig(**base)


def test_train_epoch_mixed_resolution_covers_every_clip():
    ds = _mixed_dataset()  # 9 clips at 44x56 + 6 at 56x44 = 15
    cfg = _tiny_cfg()
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(32, 32))
    step = tr.make_train_step(cfg, donate=False)
    state2, m = tr.train_epoch(state, step, cfg, ds, epoch=0)
    assert m["clips"] == 15  # every record decoded — tail not dropped
    # 15 clips across two buckets at batch 4: 9@44x56 -> 2 full + 1 tail,
    # 6@56x44 -> 1 full + 1 tail = 5 steps (tails wrap-padded per bucket).
    assert m["steps"] == 5
    assert int(state2.step) == 5
    assert np.isfinite(m["loss"])


def test_train_epoch_uniform_resolution_tail_padded():
    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=2, seed=0,
                               height=44, width=56)  # 6 clips
    cfg = _tiny_cfg()  # batch 4 -> one full step + wrap-padded tail of 2
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(32, 32))
    step = tr.make_train_step(cfg, donate=False)
    _, m = tr.train_epoch(state, step, cfg, ds, epoch=0)
    assert m["clips"] == 6 and m["steps"] == 2


def test_evaluate_classifier_mixed_resolution():
    ds = _mixed_dataset()
    cfg = _tiny_cfg()
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(32, 32))
    m = tr.evaluate_classifier(state, cfg, ds)
    assert m["n"] == 15
    # Deterministic per-clip protocol: batch packing can't change the score.
    m2 = tr.evaluate_classifier(state, cfg, ds, batch_clips=7)
    assert m["top1"] == m2["top1"]


def test_cli_train_params_warm_start(tmp_path, capsys):
    """`eov train --params <weights>` must actually warm-start the backbone
    (the reference's finetune workflow: pretrained backbone + fresh fc).
    The flag was advertised but silently ignored before r4 — training ran
    from random init whatever --params said."""
    from eov_tpu import cli
    from eov_tpu.models import get_arch
    from eov_tpu.tools.port_torch import port_resnet_state_dict, \
        export_resnet_state_dict
    from eov_tpu.utils.checkpoint import load_pytree

    # A recognizable donor backbone, exported torchvision-style to .npz
    # (what _load_params ports back in).
    ctor, sizes, bottleneck = get_arch("resnet18")
    donor = ctor(dtype=jnp.float32).init(
        jax.random.PRNGKey(123), jnp.zeros((1, 32, 32, 3))
    )
    npz = str(tmp_path / "donor.npz")
    np.savez(npz, **export_resnet_state_dict(
        donor, stage_sizes=sizes, bottleneck=bottleneck
    ))

    out_dir = str(tmp_path / "run")
    rc = cli.main([
        "train", "--platform", "cpu", "--dataset", "synthetic",
        "--synthetic-classes", "3", "--synthetic-clips", "2",
        "--arch", "resnet18", "--batch", "4", "--num-segments", "2",
        "--scale-size", "36", "--crop-size", "32",
        "--lr", "1e-6",  # tiny: saved params stay near their init
        "--epochs", "1", "--params", npz, "--out", out_dir,
    ])
    assert rc == 0, capsys.readouterr().out

    saved = load_pytree(os.path.join(out_dir, "step_0"))
    got = np.asarray(saved["params"]["conv1"]["kernel"])
    donor_k = np.asarray(donor["params"]["conv1"]["kernel"])
    # What the random init WOULD have been (cfg.seed defaults to 0).
    fresh = ctor(num_classes=3, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )["params"]["conv1"]["kernel"]
    d_donor = float(np.abs(got - donor_k).max())
    d_fresh = float(np.abs(got - np.asarray(fresh)).max())
    assert d_donor < 1e-3, d_donor          # descended from the donor
    assert d_fresh > 10 * max(d_donor, 1e-9)  # not from the fresh init
    # Donor running stats rode along too.
    np.testing.assert_allclose(
        np.asarray(saved["batch_stats"]["layer1_0"]["bn1"]["mean"]),
        np.asarray(donor["batch_stats"]["layer1_0"]["bn1"]["mean"]),
        atol=1e-6,
    )


def test_port_refuses_mismatched_donor(tmp_path):
    """Porting a BIGGER donor through a smaller target arch must refuse:
    the porter walks the TARGET's structure, so a resnet34 state_dict
    ported as resnet18 would otherwise silently truncate to the blocks the
    two archs share — a wrong-weights warm start with no symptom until
    accuracy disappoints."""
    import pytest

    from eov_tpu.models import get_arch
    from eov_tpu.tools.port_torch import (export_resnet_state_dict,
                                          port_resnet_state_dict)

    ctor, sizes, bottleneck = get_arch("resnet34")
    donor = ctor(dtype=jnp.float32).init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3))
    )
    sd = export_resnet_state_dict(donor, stage_sizes=sizes,
                                  bottleneck=bottleneck)
    with pytest.raises(ValueError, match="unconsumed"):
        port_resnet_state_dict(sd, stage_sizes=(2, 2, 2, 2),
                               bottleneck=False)
    # strict=False keeps the shared-prefix port available deliberately.
    out = port_resnet_state_dict(sd, stage_sizes=(2, 2, 2, 2),
                                 bottleneck=False, strict=False)
    assert "layer1_1" in out["params"] and "layer1_2" not in out["params"]


def test_cli_train_params_refuses_stray_modules(tmp_path):
    """Warm-starting from an orbax checkpoint of a DIFFERENT arch whose
    modules are a superset (resnet34 run, --arch resnet18) must refuse up
    front — without the guard 'missing' is empty, the stray blocks merge
    into state.params, and the run dies one step later as an opaque optax
    tree mismatch."""
    import pytest

    from eov_tpu import cli
    from eov_tpu.models import get_arch
    from eov_tpu.utils.checkpoint import save_pytree

    ctor = get_arch("resnet34")[0]
    donor = ctor(num_classes=3, dtype=jnp.float32).init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)), train=False
    )
    ck = tmp_path / "run34" / "step_0"
    save_pytree(str(ck), {"params": donor["params"],
                          "batch_stats": donor["batch_stats"]})
    with pytest.raises(SystemExit, match="does not have"):
        cli.main([
            "train", "--platform", "cpu", "--dataset", "synthetic",
            "--synthetic-classes", "3", "--synthetic-clips", "2",
            "--arch", "resnet18", "--batch", "4", "--num-segments", "2",
            "--scale-size", "36", "--crop-size", "32",
            "--epochs", "1", "--params", str(tmp_path / "run34"),
            "--out", str(tmp_path / "out18"),
        ])


def test_train_flags_reject_unknown_spellings():
    """Tri-state lever flags and the augment selector must refuse unknown
    values: EOV_TRAIN_S2D=1 (or 'true'/'ON') would otherwise silently
    resolve to OFF and a lever bench would record baseline numbers under
    the lever's label; a misspelled augment would silently run the plain
    random crop."""
    import pytest

    for field, val in [("stem_s2d", "1"), ("pool_vjp", "true"),
                       ("fused_stage1", "ON"), ("fused_stage2", "yes")]:
        with pytest.raises(ValueError, match=field):
            tr.make_train_step(_tiny_cfg(**{field: val}))
    with pytest.raises(ValueError, match="augment"):
        tr.make_train_step(_tiny_cfg(augment="mutliscale"))


def test_cli_train_params_refuses_same_shape_arch_mismatch(tmp_path):
    """resnet34 and resnet50 share stage_sizes (3,4,6,3), so their
    top-level param keys are IDENTICAL — the module-name guard passes and
    only the leaf structure/shapes differ (basic conv1/conv2 vs bottleneck
    conv1..3). Warm-starting a resnet34 orbax run as --arch resnet50 must
    refuse up front, not die one step later in optax/fused-flatten."""
    import pytest

    from eov_tpu import cli
    from eov_tpu.models import get_arch
    from eov_tpu.utils.checkpoint import save_pytree

    ctor = get_arch("resnet34")[0]
    donor = ctor(num_classes=3, dtype=jnp.float32).init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)), train=False
    )
    ck = tmp_path / "run34" / "step_0"
    save_pytree(str(ck), {"params": donor["params"],
                          "batch_stats": donor["batch_stats"]})
    with pytest.raises(SystemExit, match="leaves differ"):
        cli.main([
            "train", "--platform", "cpu", "--dataset", "synthetic",
            "--synthetic-classes", "3", "--synthetic-clips", "2",
            "--arch", "resnet50", "--batch", "4", "--num-segments", "2",
            "--scale-size", "36", "--crop-size", "32",
            "--epochs", "1", "--params", str(tmp_path / "run34"),
            "--out", str(tmp_path / "out50"),
        ])


def test_cli_train_resume_overrides_warm_start(tmp_path, capsys):
    """cli.py documents that a resume checkpoint under --out takes
    precedence over --params warm-start (the run's own trajectory beats a
    re-supplied donor on restart — a pod rerun of the same command line
    must continue, not restart from the donor). Proven by lineage: the
    resumed epoch's params descend from run A's fresh init, not the
    donor."""
    from eov_tpu import cli
    from eov_tpu.models import get_arch
    from eov_tpu.tools.port_torch import export_resnet_state_dict
    from eov_tpu.utils.checkpoint import load_pytree

    ctor, sizes, bottleneck = get_arch("resnet18")
    donor = ctor(dtype=jnp.float32).init(
        jax.random.PRNGKey(123), jnp.zeros((1, 32, 32, 3))
    )
    npz = str(tmp_path / "donor.npz")
    np.savez(npz, **export_resnet_state_dict(
        donor, stage_sizes=sizes, bottleneck=bottleneck
    ))
    common = [
        "train", "--platform", "cpu", "--dataset", "synthetic",
        "--synthetic-classes", "3", "--synthetic-clips", "2",
        "--arch", "resnet18", "--batch", "4", "--num-segments", "2",
        "--scale-size", "36", "--crop-size", "32",
        "--lr", "1e-6",  # tiny: params stay near their origin
        "--out", str(tmp_path / "run"),
    ]
    # Run A: no --params — epoch 0 descends from the fresh init (seed 0).
    assert cli.main(common + ["--epochs", "1"]) == 0
    # Run B: donor warm-start requested, but step_0 exists — must resume.
    assert cli.main(common + ["--epochs", "2", "--params", npz]) == 0
    assert "resumed from" in capsys.readouterr().out

    saved = np.asarray(load_pytree(
        str(tmp_path / "run" / "step_1")
    )["params"]["conv1"]["kernel"])
    fresh = np.asarray(ctor(num_classes=3, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )["params"]["conv1"]["kernel"])
    donor_k = np.asarray(donor["params"]["conv1"]["kernel"])
    d_fresh = float(np.abs(saved - fresh).max())
    d_donor = float(np.abs(saved - donor_k).max())
    assert d_fresh < 1e-3, d_fresh            # continued run A's lineage
    assert d_donor > 10 * max(d_fresh, 1e-9)  # donor did NOT replace it


def test_cli_test_refuses_raw_backbone_weights(tmp_path):
    """`eov test --params x.npz` (a ported backbone, no finetuned head)
    must refuse with guidance, not crash inside orbax / score a random
    head."""
    import pytest

    from eov_tpu import cli

    npz = tmp_path / "backbone.npz"
    npz.write_bytes(b"")  # never opened: the refusal is by extension
    with pytest.raises(SystemExit, match="finetuned checkpoint"):
        cli.main([
            "test", "--platform", "cpu", "--dataset", "synthetic",
            "--synthetic-classes", "3", "--synthetic-clips", "1",
            "--arch", "resnet18", "--params", str(npz),
        ])
