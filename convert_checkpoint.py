"""Convert reference PyTorch pickles into long_video_gan_tpu checkpoints.

Usage:
    python convert_checkpoint.py --pkl horseback_lres.pkl --kind lres \\
        --output horseback_lres.lvg [--reference /root/reference]

Unpickling a reference checkpoint requires the reference repo on sys.path
(its pickles reconstruct classes from embedded source via
torch_utils.persistence). The output .lvg file is arrays-only and loads
without executing any checkpoint content.
"""

from __future__ import annotations

import sys

import click


@click.command()
@click.option("--pkl", "pkl_path", type=str, required=True, help="Reference G_ema pickle")
@click.option("--kind", type=click.Choice(["lres", "sres"]), required=True)
@click.option("--output", type=str, required=True, help="Output .lvg checkpoint")
@click.option("--reference", "reference_dir", type=str, default="/root/reference",
              help="Reference repo path (for unpickling only)")
def main(pkl_path, kind, output, reference_dir):
    # jax must initialize before torch (TPU plugin wedges otherwise).
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, reference_dir)
    from long_video_gan_tpu.io.checkpoint import save_generator
    from long_video_gan_tpu.io.convert_torch import (
        install_reference_unpickle_shims,
        load_reference_pickle_state,
        torch_state_to_variables,
    )

    install_reference_unpickle_shims()

    state_dict, init_kwargs = load_reference_pickle_state(pkl_path)
    print(f"Loaded {pkl_path}: {len(state_dict)} tensors, init_kwargs={init_kwargs}")

    if kind == "lres":
        from long_video_gan_tpu.models.generator_lres import VideoGenerator

        G = VideoGenerator(**init_kwargs)
        variables = jax.eval_shape(
            lambda: G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, 8))
        config = dict(kind="generator_lres", kwargs=init_kwargs)
    else:
        from long_video_gan_tpu.models.generator_sres import VideoGenerator

        G = VideoGenerator(**init_kwargs)
        dummy = jnp.zeros((1, 3, 1 + 2 * G.temporal_context, G.lr_height, G.lr_width))
        variables = jax.eval_shape(
            lambda: G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, dummy))
        config = dict(kind="generator_sres", kwargs=init_kwargs)

    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    variables = torch_state_to_variables(state_dict, variables)
    save_generator(output, variables, config)
    print(f"Wrote {output}")


if __name__ == "__main__":
    main()
