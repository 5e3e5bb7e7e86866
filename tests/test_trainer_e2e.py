"""Trainer-driver end-to-end test on CPU: tiny model, toy dataset synthesized
from fixtures, runs the full train() path (loader -> multi-step scan -> logging
-> orbax checkpoint -> resume)."""
import os
import shutil

import numpy as np
import pytest

from osu_diffusion_tpu.models import DiT_models
from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.train.trainer import TrainConfig, train

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")


@pytest.fixture()
def toy_dataset(tmp_path):
    for i in range(2):
        d = tmp_path / f"Track{i:05d}" / "beatmaps"
        d.mkdir(parents=True)
    files = sorted(os.listdir(os.path.join(ASSETS, "stream")))[:8]
    for idx, name in enumerate(files):
        shutil.copy(
            os.path.join(ASSETS, "stream", name),
            tmp_path / f"Track{idx % 2:05d}" / "beatmaps" / f"{idx:06d} map.osu",
        )
    shutil.copy(
        os.path.join(ASSETS, "kimi_no_bouken.osu"),
        tmp_path / "Track00000" / "beatmaps" / "000099 kimi.osu",
    )
    return str(tmp_path)


@pytest.fixture()
def tiny_registry(monkeypatch):
    def tiny(**kw):
        return DiT(DiTConfig(hidden_size=32, depth=1, num_heads=2, **kw))

    monkeypatch.setitem(DiT_models, "DiT-T", tiny)
    return "DiT-T"


def test_train_driver_end_to_end(toy_dataset, tiny_registry, tmp_path):
    results = str(tmp_path / "results")
    config = TrainConfig(
        data_path=toy_dataset,
        num_classes=100,
        data_start=0,
        data_end=2,
        results_dir=results,
        model=tiny_registry,
        epochs=10,
        global_batch_size=8,
        num_workers=0,
        log_every=4,
        ckpt_every=8,
        seq_len=16,
        stride=8,
        max_steps=12,
        steps_per_call=2,
        use_bf16=False,
    )
    out = train(config)
    assert out["final_step"] >= 12
    assert np.isfinite(out["last_loss"])
    exp = out["experiment_dir"]
    assert os.path.isfile(os.path.join(exp, "log.txt"))
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert any(c.isdigit() for c in ckpts)
    # the log format feeds plot_loss (parity contract)
    from osu_diffusion_tpu.evals.plot_loss import parse_losses

    losses = parse_losses(os.path.join(exp, "log.txt"))
    assert len(losses) >= 1

    # resume from the saved checkpoint
    ckpt_path = os.path.join(
        exp, "checkpoints", max(c for c in ckpts if c.isdigit())
    )
    config2 = TrainConfig(
        data_path=toy_dataset,
        num_classes=100,
        data_start=0,
        data_end=2,
        results_dir=results,
        model=tiny_registry,
        epochs=10,
        global_batch_size=8,
        num_workers=0,
        log_every=4,
        ckpt_every=1000,
        seq_len=16,
        stride=8,
        max_steps=14,
        steps_per_call=2,
        use_bf16=False,
        ckpt=ckpt_path,
    )
    out2 = train(config2)
    assert out2["final_step"] >= 14


def test_train_driver_with_context_parallelism(toy_dataset, tiny_registry, tmp_path):
    """train(context_parallel=True): the full driver path with the attention
    sequence axis sharded over the mesh 'model' axis (round-3 CP training).
    seq_len 256 = num_model(2) * 128; only the 757-row filler map yields
    windows at this length."""
    results = str(tmp_path / "results_cp")
    config = TrainConfig(
        data_path=toy_dataset,
        num_classes=100,
        data_start=0,
        data_end=2,
        results_dir=results,
        model=tiny_registry,
        epochs=10 ** 6,
        global_batch_size=4,
        num_workers=0,
        log_every=2,
        ckpt_every=10 ** 6,
        seq_len=256,
        stride=128,
        max_steps=2,
        steps_per_call=1,
        num_model=2,
        band=128,
        context_parallel=True,
        remat=False,
    )
    out = train(config)
    assert out["final_step"] >= 2
    assert np.isfinite(out["last_loss"])
