"""`cli export`: jax.export serving artifact of the trained forward
(params baked in, loadable without model definitions)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    """Params-only checkpoint dir of a tiny freshly-initialized net."""
    import orbax.checkpoint as ocp

    from surfacenet_tpu.config import Config, ModelConfig, VoxelConfig
    from surfacenet_tpu.models.surfacenet import init_surfacenet

    cfg = Config(
        voxel=VoxelConfig(cube_size=8, voxel_size_mm=2.0, overlap=2),
        model=ModelConfig.tiny(),
    )
    _, variables = init_surfacenet(
        cfg.model, jax.random.PRNGKey(0), D=cfg.voxel.cube_size
    )
    wdir = tmp_path_factory.mktemp("w") / "tiny_params"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(wdir),
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
        force=True,
    )
    ckptr.wait_until_finished()
    return str(wdir), cfg


def test_export_selfcheck_roundtrip(tiny_weights, tmp_path, capsys):
    from surfacenet_tpu.cli import main

    wdir, cfg = tiny_weights
    out = str(tmp_path / "fwd.stablehlo")
    main([
        "export", "--checkpoint", wdir, "--out", out, "--batch", "2",
        "--selfcheck",
        "--set", "voxel.cube_size=8", "--set", "voxel.voxel_size_mm=2.0",
        "--set", "voxel.overlap=2",
        "--set", 'model.block_channels=[8, 12, 16, 16]',
        "--set", 'model.convs_per_block=[1, 1, 1, 1]',
        "--set", "model.side_channels=4",
        "--set", 'model.dtype="float32"',
    ])
    assert os.path.getsize(out) > 1000
    assert "selfcheck: max" in capsys.readouterr().out

    # serving side: deserialize WITHOUT surfacenet model defs and call
    from jax import export as jexport

    with open(out, "rb") as f:
        rt = jexport.deserialize(bytearray(f.read()))
    x = jnp.zeros((2, 8, 8, 8, 6), jnp.float32)
    p = np.asarray(rt.call(x))
    assert p.shape == (2, 8, 8, 8)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
