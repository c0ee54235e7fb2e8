"""Weight converter tests: torch-layout state_dict -> flax tree bijection."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.convert import convert_vipt_checkpoint, load_into
from mmtrack_tpu.models.vipt import ViPTrack

TINY = dict(embed_dim=32, depth=2, num_heads=2, patch_size=16,
            template_size=32, search_size=64, ce_loc=(1,),
            prompt_type="vipt_deep", head_channel=16)


def _torch_names_from_flax(flat: dict) -> dict:
    """Inverse of the converter's mapping: emit torch-layout arrays."""
    sd = {}
    for path, v in flat.items():
        p = "/".join(str(k) for k in path)
        v = np.asarray(v)
        if p.startswith("backbone/patch_embed"):
            mod = "patch_embed_prompt" if "patch_embed_prompt" in p else "patch_embed"
            if p.endswith("kernel"):
                sd[f"backbone.{mod}.proj.weight"] = v.transpose(3, 2, 0, 1)
            else:
                sd[f"backbone.{mod}.proj.bias"] = v
        elif p in ("backbone/pos_embed_z", "backbone/pos_embed_x"):
            sd["backbone." + p.split("/")[1]] = v
        elif "/blocks_" in p:
            i = p.split("blocks_")[1].split("/")[0]
            rest = p.split(f"blocks_{i}/")[1]
            name = f"backbone.blocks.{i}."
            if rest.startswith("norm"):
                ln, leaf = rest.split("/")
                sd[name + f"{ln}." + ("weight" if leaf == "scale" else "bias")] = v
            elif rest.startswith("attn"):
                _, mod, leaf = rest.split("/")
                sd[name + f"attn.{mod}." + ("weight" if leaf == "kernel" else "bias")] = \
                    v.T if leaf == "kernel" else v
            elif rest.startswith("mlp"):
                _, fc, leaf = rest.split("/")
                sd[name + f"mlp.{fc}." + ("weight" if leaf == "kernel" else "bias")] = \
                    v.T if leaf == "kernel" else v
        elif "/prompt_blocks_" in p:
            i = p.split("prompt_blocks_")[1].split("/")[0]
            rest = p.split(f"prompt_blocks_{i}/")[1]
            if rest == "fovea/smooth":
                sd[f"backbone.prompt_blocks.{i}.fovea.smooth"] = v
            else:
                conv, leaf = rest.split("/")
                if leaf == "kernel":
                    sd[f"backbone.prompt_blocks.{i}.{conv}.weight"] = \
                        v.T[:, :, None, None]
                else:
                    sd[f"backbone.prompt_blocks.{i}.{conv}.bias"] = v
        elif "/prompt_norms_" in p:
            i = p.split("prompt_norms_")[1].split("/")[0]
            leaf = p.split("/")[-1]
            sd[f"backbone.prompt_norms.{i}." + ("weight" if leaf == "scale" else "bias")] = v
        elif p.startswith("backbone/norm/"):
            leaf = p.split("/")[-1]
            sd["backbone.norm." + ("weight" if leaf == "scale" else "bias")] = v
        elif p.startswith("box_head/layers_"):
            _, lname, leaf = p.split("/")
            i = lname.split("_")[1]
            sd[f"box_head.layers.{i}." + ("weight" if leaf == "kernel" else "bias")] = \
                v.T if leaf == "kernel" else v
        elif p.startswith("box_head/"):
            _, branch, conv, *rest = p.split("/")
            tname = f"box_head.{conv}_{branch}"
            if conv == "conv5":
                leaf = rest[0]
                sd[tname + ("." + ("weight" if leaf == "kernel" else "bias"))] = \
                    v.transpose(3, 2, 0, 1) if leaf == "kernel" else v
            else:
                mod, leaf = rest
                if mod == "conv":
                    sd[tname + ".0." + ("weight" if leaf == "kernel" else "bias")] = \
                        v.transpose(3, 2, 0, 1) if leaf == "kernel" else v
                else:  # bn
                    torch_leaf = {"scale": "weight", "bias": "bias",
                                  "mean": "running_mean", "var": "running_var"}[leaf]
                    sd[tname + f".1.{torch_leaf}"] = v
    return sd


def test_converter_roundtrip_full_coverage():
    model = ViPTrack(**TINY)
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    variables = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    params = flax.core.unfreeze(variables["params"])
    flat = flax.traverse_util.flatten_dict(params)

    sd = _torch_names_from_flax(flat)
    converted = convert_vipt_checkpoint(sd)
    loaded, missing, unexpected = load_into(params, converted)

    assert unexpected == []
    assert missing == [], f"missing: {missing[:10]}"
    flat_l = flax.traverse_util.flatten_dict(loaded)
    for k in flat:
        np.testing.assert_allclose(np.asarray(flat_l[k]), np.asarray(flat[k]),
                                   err_msg=str(k))


def test_converter_roundtrip_corner_and_mlp_heads():
    """CORNER (conv{k}_{tl,br}) and MLP (layers.N) checkpoint heads must
    convert too (caught live: only the CENTER head regex existed, so
    those heads silently stayed at random init)."""
    for head_type in ("CORNER", "MLP"):
        model = ViPTrack(head_type=head_type, **TINY)
        z = jnp.zeros((1, 32, 32, 6))
        x = jnp.zeros((1, 64, 64, 6))
        variables = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(1))
        params = flax.core.unfreeze(variables["params"])
        flat = flax.traverse_util.flatten_dict(params)
        sd = _torch_names_from_flax(flat)
        loaded, missing, unexpected = load_into(
            params, convert_vipt_checkpoint(sd))
        assert missing == [], f"{head_type} missing: {missing[:8]}"
        flat_l = flax.traverse_util.flatten_dict(loaded)
        for k in flat:
            np.testing.assert_allclose(np.asarray(flat_l[k]),
                                       np.asarray(flat[k]), err_msg=str(k))


@pytest.mark.slow
def test_converter_forward_equivalence():
    """Converted weights must drive the model identically to the originals."""
    model = ViPTrack(**TINY)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 32, 32, 6).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 64, 64, 6).astype(np.float32))
    variables = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(1))
    params = flax.core.unfreeze(variables["params"])
    sd = _torch_names_from_flax(flax.traverse_util.flatten_dict(params))
    loaded, _, _ = load_into(jax.tree.map(np.zeros_like, params),
                             convert_vipt_checkpoint(sd))
    out_orig = model.apply({"params": params}, z, x)
    out_conv = model.apply({"params": loaded}, z, x)
    np.testing.assert_allclose(np.asarray(out_conv["score_map"]),
                               np.asarray(out_orig["score_map"]), atol=1e-6)


@pytest.mark.slow
def test_load_into_shape_mismatch_raises():
    import pytest
    model = ViPTrack(**TINY)
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    params = flax.core.unfreeze(
        jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))["params"])
    bad = {"backbone": {"pos_embed_z": np.zeros((1, 999, 32))}}
    with pytest.raises(ValueError):
        load_into(params, bad)
