"""CLI smoke tests (tiny configs, synthetic data) + aux subsystem tests."""

import json
import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def test_tiny_sd_cli_train_and_sample(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.cli import tiny_sd

    cfg = {
        "epoch": 1, "batch_size": 8, "img_channel": 3, "img_size": 16,
        "num_class": 3, "T": 5, "beta_1": 0.0015, "beta_T": 0.0195,
        "channel": 32, "channel_multy": [1, 2, 2, 2], "dropout": 0.0,
        "lr": 1.0e-4, "max_lr": 1.0e-3, "grad_clip": 1.0,
        "train_rand": 0.05, "w": 1.8, "nrow": 4,
        "model_dir": str(tmp_path / "ckpt"), "dtype": "fp32",
        "warmup_epochs": 1,
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    assert tiny_sd.main(["train", "--config", str(cfg_path),
                         "--synthetic", "--epochs", "1"]) == 0
    out = tmp_path / "grid.png"
    assert tiny_sd.main(["sample", "--config", str(cfg_path),
                         "--ckpt", cfg["model_dir"], "--out", str(out),
                         "--labels", "1,2,3,1"]) == 0
    assert out.exists()


def test_vae_cli_train(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.cli import vae

    assert vae.main(["train", "--model", "vqvae", "--synthetic",
                     "--img-size", "32", "--batch-size", "8",
                     "--epochs", "1", "--embedding-dim", "4",
                     "--num-embeddings", "16",
                     "--model-dir", str(tmp_path / "vae"),
                     "--preview-dir", str(tmp_path / "previews")]) == 0
    assert os.path.exists(tmp_path / "previews")


def test_vit_cli_train(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.cli import vit

    assert vit.main(["train", "--synthetic", "--img-size", "16",
                     "--patch-size", "8", "--batch-size", "8",
                     "--epochs", "1",
                     "--model-dir", str(tmp_path / "vit")]) == 0


def test_sd1_cli_requires_prompt():
    from from_ddpm_to_stable_diffusion_tpu.cli import sd1

    with pytest.raises(SystemExit):
        sd1.main(["generate"])  # missing --prompt


def test_demos_gated_errors(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.cli import demos

    with pytest.raises(RuntimeError, match="REPLICATE_API_TOKEN"):
        demos.replicate_run("ver", {}, api_token=None)
    img = tmp_path / "x.bin"
    img.write_bytes(b"abc")
    uri = demos.encode_image_base64(str(img))
    assert uri.startswith("data:application/octet-stream;base64,")


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    from from_ddpm_to_stable_diffusion_tpu.io import DataLoader, ImageFolderDataset

    for cls in ["cat", "dog"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.new("RGB", (10, 8), (i * 40, 0, 0)).save(d / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), img_size=8, to_unit_range=True)
    assert len(ds) == 6
    assert ds.class_names == ["cat", "dog"]
    img, label = ds.load(0)
    assert img.shape == (8, 8, 3) and label == 0
    assert img.min() >= -1.0 and img.max() <= 1.0
    batches = list(DataLoader(ds, batch_size=4, seed=0))
    assert len(batches) == 1  # drop remainder
    assert batches[0][0].shape == (4, 8, 8, 3)


def test_profiler_utils():
    import jax.numpy as jnp

    from from_ddpm_to_stable_diffusion_tpu.utils.profiler import (StepProfiler,
                                                                  debug_shapes,
                                                                  nan_check)

    prof = StepProfiler(warmup=1)
    for _ in range(3):
        with prof:
            x = jnp.ones((4, 4)) * 2
        prof.stop(x)
    s = prof.summary()
    assert s["steps"] == 2 and s["mean_ms"] >= 0

    debug_shapes("test", {"a": np.zeros((2, 3))})
    nan_check({"x": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        nan_check({"x": jnp.asarray([1.0, float("nan")])})


def test_metrics_logger(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.utils.logging import MetricsLogger

    path = tmp_path / "m.jsonl"
    log = MetricsLogger(str(path))
    log.log("epoch", loss=1.5, step=3)
    log.close()
    rec = json.loads(path.read_text().strip())
    assert rec["event"] == "epoch" and rec["loss"] == 1.5 and rec["step"] == 3


def test_shapes_dataset_classes():
    from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import ShapesDataset

    ds = ShapesDataset(n=9, img_size=32)
    assert len(ds) == 9
    for i in range(6):
        img, label = ds.load(i)
        assert img.shape == (32, 32, 3)
        assert label == i % 3
        assert img.min() >= -1.0 and img.max() <= 1.0
        # a shape exists: some pixels differ from the background
        assert (img > -0.85).any()
    # deterministic
    a, _ = ds.load(3)
    b, _ = ds.load(3)
    np.testing.assert_array_equal(a, b)


def test_video_cli_train_and_sample(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.cli import video

    out = tmp_path / "grid.png"
    rc = video.main([
        "train", "--epochs", "1", "--clips", "8", "--img-size", "16",
        "--frames", "2", "--batch-size", "8", "--channel", "32",
        "--T", "5", "--dtype", "fp32", "--out", str(out)])
    assert rc == 0
    assert out.exists() or out.with_suffix(".png.npy").exists()


@pytest.mark.slow
def test_sd3_cli_sequence_parallel(tmp_path, devices8):
    """sd3 generate --sp 2: the MMDiT joint attention runs under Ulysses
    sequence parallelism end to end through the CLI smoke path."""
    from from_ddpm_to_stable_diffusion_tpu.cli import sd3

    out = tmp_path / "sd3_sp.png"
    rc = sd3.main(["generate", "--prompt", "a cat", "--width", "128",
                   "--height", "128", "--steps", "2", "--sp", "2",
                   "--sp-impl", "ulysses", "--out", str(out)])
    assert rc == 0 and out.exists()


@pytest.mark.slow
def test_sd3_cli_train_fsdp_lora(devices8, capsys):
    """sd3 train: rectified-flow MMDiT training through the CLI —
    ZeRO-sharded state + LoRA adapters on the 8-fake-device mesh."""
    from from_ddpm_to_stable_diffusion_tpu.cli import sd3

    rc = sd3.main(["train", "--steps", "4", "--batch-size", "8",
                   "--img-size", "8", "--context-len", "4",
                   "--context-dim", "16", "--adm", "16",
                   "--dtype", "fp32", "--fsdp", "--lora-rank", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sampled latents" in out


@pytest.mark.slow
def test_sd3_cli_train_moe_grad_accum(devices8, capsys):
    """sd3 train --moe-experts --grad-accum: the sparse-MMDiT trainer with
    accumulation windows through the CLI."""
    from from_ddpm_to_stable_diffusion_tpu.cli import sd3

    rc = sd3.main(["train", "--steps", "4", "--batch-size", "8",
                   "--img-size", "8", "--context-len", "4",
                   "--context-dim", "16", "--adm", "16",
                   "--dtype", "fp32", "--moe-experts", "4",
                   "--grad-accum", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sampled latents" in out


@pytest.mark.slow
def test_sd3_cli_img2img(tmp_path):
    """sd3 generate --init-image: the img2img branch (VAE encode +
    partial denoise, ref sd3_infer.py:349-362) through the CLI."""
    from PIL import Image

    from from_ddpm_to_stable_diffusion_tpu.cli import sd3

    src = tmp_path / "init.png"
    Image.fromarray(
        (np.arange(128 * 128 * 3) % 255).astype("uint8").reshape(
            128, 128, 3)).save(src)
    out = tmp_path / "sd3_i2i.png"
    rc = sd3.main(["generate", "--prompt", "a dog", "--width", "128",
                   "--height", "128", "--steps", "4", "--strength", "0.5",
                   "--init-image", str(src), "--out", str(out)])
    assert rc == 0 and out.exists()


def test_checks_plot_schedule(tmp_path):
    """visual_alpha equivalent (reference 06_…/01_check.py:33-47)."""
    from from_ddpm_to_stable_diffusion_tpu.cli import checks

    out = tmp_path / "parameters.png"
    checks.main(["tiny", "--plot-schedule", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_validate_real_weights_smoke():
    """Weights-day runbook (tools/validate_real_weights.sh): the
    CPU-reachable wiring — CLI surfaces, importer entry points, metrics
    math — must stay green so parity closure is one command when the
    reference's assets land (ROADMAP 'Blocked on assets')."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        ["bash", os.path.join(root, "tools", "validate_real_weights.sh"),
         "--smoke"],
        capture_output=True, text=True, cwd=root, timeout=600,
        env={**os.environ, "PYTHONPATH": root})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "smoke OK" in r.stdout
