"""DreamBooth: class-prior generation, the combined instance+prior step,
and training-state sanity."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def instance_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("db_instance")
    rng = np.random.default_rng(7)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    return str(d)


def test_train_dreambooth(instance_dir, tmp_path):
    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.dreambooth import train_dreambooth

    cfg = load_yaml("configs/dreambooth_smoke.yaml")
    cfg["train"]["total_steps"] = 3
    cfg["train"]["checkpoint_every"] = 3
    cfg["train"]["eval_every"] = 100
    out = str(tmp_path / "db_run")
    state = train_dreambooth(cfg, instance_dir, out_dir=out)
    assert int(state.step) == 3

    # prior images were generated from the frozen model before training
    class_dir = os.path.join(out, "class_images")
    imgs = [f for f in os.listdir(class_dir) if f.endswith(".png")]
    assert len(imgs) == 2

    # both loss components logged each step
    import json

    rows = [json.loads(l) for l in
            open(os.path.join(out, "metrics.jsonl"))]
    step_rows = [r for r in rows if "train/instance_loss" in r
                 or "instance_loss" in str(r)]
    assert step_rows, rows[:2]


def test_dreambooth_class_dir_skips_generation(instance_dir, tmp_path):
    """A provided class_data_dir is used as-is (no sampling pass)."""
    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.dreambooth import train_dreambooth

    cfg = load_yaml("configs/dreambooth_smoke.yaml")
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100
    cfg["dreambooth"]["class_data_dir"] = instance_dir
    out = str(tmp_path / "db_run2")
    state = train_dreambooth(cfg, instance_dir, out_dir=out)
    assert int(state.step) == 2
    assert not os.path.exists(os.path.join(out, "class_images"))
