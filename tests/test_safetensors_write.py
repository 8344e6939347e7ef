"""safetensors export: byte-level roundtrip + ecosystem interop.

save_safetensors_dict (io/weights.py) is the interop EXPORT path — a
state trained here must be readable by both our readers (native C++ mmap
and python fallback) and the upstream safetensors package (what the
reference's load_into consumes, sd3_infer.py:20-44).
"""

import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io.weights import (
    flatten_tree, load_safetensors_dict, save_safetensors_dict)


def sample_tensors():
    import ml_dtypes

    r = np.random.default_rng(0)
    return {
        "block/kernel": r.normal(size=(4, 8)).astype(np.float32),
        "block/bias": r.normal(size=(8,)).astype(np.float32),
        "emb/table": r.integers(0, 100, (16, 3)).astype(np.int32),
        "half": r.normal(size=(2, 2)).astype(ml_dtypes.bfloat16),
    }


def test_roundtrip_native_and_python(tmp_path, monkeypatch):
    tensors = sample_tensors()
    path = str(tmp_path / "out.safetensors")
    save_safetensors_dict(tensors, path, metadata={"step": 7})

    back = load_safetensors_dict(path)   # native C++ reader first
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(
            back[k].view(np.uint8), tensors[k].view(np.uint8))

    monkeypatch.setenv("FDSD_ST_READER", "python")
    back_py = load_safetensors_dict(path)
    for k in tensors:
        np.testing.assert_array_equal(
            np.asarray(back_py[k]).view(np.uint8),
            tensors[k].view(np.uint8))


def test_upstream_package_reads_our_file(tmp_path):
    """The pip safetensors package (the reference's consumer) parses our
    header, tensors, and metadata."""
    pytest.importorskip("safetensors")
    from safetensors import safe_open

    tensors = {k: v for k, v in sample_tensors().items() if k != "half"}
    path = str(tmp_path / "interop.safetensors")
    save_safetensors_dict(tensors, path, metadata={"source": "fdsd-tpu"})
    with safe_open(path, framework="np") as f:
        assert f.metadata() == {"source": "fdsd-tpu"}
        for k in tensors:
            np.testing.assert_array_equal(f.get_tensor(k), tensors[k])


def test_flatten_tree_and_param_export(tmp_path):
    """A flax param tree (and a LoRA adapter dict) exports losslessly."""
    tree = {"enc": {"attn": {"qkv": {"kernel": np.ones((3, 3))}},
                    "norm": {"scale": np.zeros((3,))}},
            "head": {"bias": np.full((2,), 5.0)}}
    flat = flatten_tree(tree)
    assert set(flat) == {"enc/attn/qkv/kernel", "enc/norm/scale",
                         "head/bias"}
    path = str(tmp_path / "params.safetensors")
    save_safetensors_dict(flat, path)
    back = load_safetensors_dict(path)
    for k, v in flat.items():
        np.testing.assert_array_equal(back[k], v)


def test_unsupported_dtype_raises(tmp_path):
    with pytest.raises(ValueError, match="no safetensors encoding"):
        save_safetensors_dict(
            {"c": np.zeros((2,), np.complex64)},
            str(tmp_path / "bad.safetensors"))
