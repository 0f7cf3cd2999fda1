"""AOT serving artifact (convert/aot.py): export -> serialize ->
deserialize -> call must reproduce the in-process folded pipeline's
class map, with no model code on the consumer side."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pidnet_tpu.convert.aot import export_serving, load_serving, make_serving_fn
from pidnet_tpu.models import pidnet as M


@pytest.fixture(scope="module")
def net():
    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    return spec, params, state


def test_roundtrip_matches_direct(net, rng):
    spec, params, state = net
    x = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)

    blob = export_serving(
        params, state, spec, (64, 128), platforms=("cpu",)
    )
    assert isinstance(blob, bytes) and len(blob) > 0

    loaded = load_serving(blob)
    got = np.asarray(loaded.call(jnp.asarray(x)))

    from pidnet_tpu.convert import fold_params

    folded = fold_params(params, state, spec)
    # jit the reference: the artifact is the serialized lowering of the
    # jitted fn, so the compiled programs are identical; the EAGER fn
    # differs by bf16 reassociation noise, which flips argmax ties on a
    # random-init net
    want = np.asarray(jax.jit(make_serving_fn(folded, spec))(jnp.asarray(x)))
    assert got.shape == (1, 64, 128)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


def test_file_roundtrip_and_jit(net, rng, tmp_path):
    spec, params, state = net
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    blob = export_serving(params, state, spec, (64, 64), platforms=("cpu",))
    p = tmp_path / "serve.jaxexp"
    p.write_bytes(blob)
    loaded = load_serving(str(p))
    # jit-compatible: the exported call caches like any jitted fn
    fn = jax.jit(loaded.call)
    a = np.asarray(fn(jnp.asarray(x)))
    b = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 64, 64)


def test_convert_cli_export_aot(net, rng, tmp_path, monkeypatch):
    spec, params, state = net
    from pidnet_tpu.train import checkpoint as ckpt
    from pidnet_tpu.tools import convert as convert_cli

    src = tmp_path / "model.msgpack"
    ckpt.save_model(str(src), params, state)
    dst = tmp_path / "serve.jaxexp"
    convert_cli.main(
        [str(src), str(dst), "--a", "pidnet-s", "--c", "19",
         "--export-aot", "--r", "64", "64", "--platforms", "cpu"]
    )
    loaded = load_serving(str(dst))
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(loaded.call(jnp.asarray(x)))
    assert out.shape == (1, 64, 64) and out.dtype == np.int32
    assert out.min() >= 0 and out.max() < 19


def test_export_requires_resolution(tmp_path):
    from pidnet_tpu.tools import convert as convert_cli

    with pytest.raises(SystemExit, match="--r"):
        convert_cli.main(
            [str(tmp_path / "x.msgpack"), str(tmp_path / "y"), "--export-aot"]
        )


def test_speed_cli_aot_mode(net, tmp_path, capsys):
    spec, params, state = net
    blob = export_serving(params, state, spec, (64, 64), platforms=("cpu",))
    p = tmp_path / "serve.jaxexp"
    p.write_bytes(blob)
    from pidnet_tpu.tools import speed

    speed.main(["--aot", str(p)])
    out = capsys.readouterr().out
    assert "AOT Artifact Speed Testing" in out
    assert "64x64 batch=1" in out and "FPS" in out
