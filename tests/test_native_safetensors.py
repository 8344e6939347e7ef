"""C++ safetensors reader parity vs the safetensors package."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # one-time g++ build


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {
        "model.layer.0.weight": rng.standard_normal((4, 8)).astype(
            np.float32),
        "model.layer.0.bias": rng.standard_normal((8,)).astype(np.float32),
        "model.emb": rng.standard_normal((16, 4)).astype(np.float16),
        "ids": rng.integers(0, 100, (7,)).astype(np.int64),
        "flag": np.asarray([True, False, True]),
        "scalar": np.asarray(3.5, np.float32),
        "bytes8": rng.integers(0, 255, (3, 3)).astype(np.uint8),
    }
    try:
        import ml_dtypes

        tensors["model.bf16"] = rng.standard_normal((5, 6)).astype(
            ml_dtypes.bfloat16)
    except ImportError:
        pass
    path = tmp_path_factory.mktemp("st") / "test.safetensors"
    save_file(tensors, str(path), metadata={"format": "pt"})
    return str(path), tensors


def test_native_reader_matches_package(st_file):
    from from_ddpm_to_stable_diffusion_tpu.io.native import NativeSafetensors

    path, tensors = st_file
    with NativeSafetensors(path) as f:
        assert sorted(f.keys()) == sorted(tensors)
        for name, want in tensors.items():
            got = f.get_tensor(name)          # safe default: a copy
            view = f.get_tensor(name, copy=False)
            assert got.shape == want.shape, name
            assert got.dtype == want.dtype, name
            # byte-exact both ways (covers bf16, whose kind is 'V')
            as_bytes = lambda a: np.ascontiguousarray(a).reshape(-1).view(
                np.uint8)
            np.testing.assert_array_equal(as_bytes(got), as_bytes(want),
                                          name)
            np.testing.assert_array_equal(as_bytes(np.array(view)),
                                          as_bytes(want), name)


def test_native_reader_copy_outlives_close(st_file):
    from from_ddpm_to_stable_diffusion_tpu.io.native import NativeSafetensors

    path, tensors = st_file
    f = NativeSafetensors(path)
    arr = f.get_tensor("model.layer.0.weight", copy=True)
    f.close()
    np.testing.assert_array_equal(arr, tensors["model.layer.0.weight"])


def test_load_safetensors_dict_uses_native(st_file, monkeypatch):
    """The weight-import entry goes through the native reader and matches
    the python package byte for byte (prefix filter included)."""
    from from_ddpm_to_stable_diffusion_tpu.io.weights import (
        load_safetensors_dict)

    path, tensors = st_file
    native = load_safetensors_dict(path, prefix="model.")
    monkeypatch.setenv("FDSD_ST_READER", "python")
    python = load_safetensors_dict(path, prefix="model.")
    assert sorted(native) == sorted(python)
    for k in native:
        assert native[k].dtype == python[k].dtype
        np.testing.assert_array_equal(native[k], python[k])


def test_native_reader_rejects_garbage(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.io.native import NativeSafetensors

    bad = tmp_path / "bad.safetensors"
    bad.write_bytes(b"\xff" * 64)
    with pytest.raises(ValueError):
        NativeSafetensors(str(bad))
