#!/usr/bin/env python
"""Style-transfer CLI: apply one or more style songs to a composition.

The reference exposes transfer only as a library function taking an unpickled
torch model (style/style_transfer.py:22); this CLI is the user-facing entry:

    python style-transfer.py composition.mid style1.mid [style2.mid ...] \
        --out outputs/ [--snapshots snapshots/] [--cpu]

Without a snapshot a freshly initialized model is used (structure demo only).
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("composition")
    parser.add_argument("styles", nargs="+")
    parser.add_argument("--out", default="style_transfer_output/")
    parser.add_argument("--snapshots", default=None,
                        help="orbax snapshot dir to load trained params from")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mst_tpu.models import StyleTransferModel
    from mst_tpu.transfer import ModelBundle, transfer_style

    model = StyleTransferModel()
    if args.snapshots:
        # load_trained_params builds its own init template, so the fresh-init
        # path below (seconds of jitted CPU init) is skipped entirely
        from mst_tpu.runtime.checkpoint import load_trained_params
        params, step = load_trained_params(model, args.snapshots,
                                           seed=args.seed)
        if params is None:
            raise SystemExit(f"no snapshots under {args.snapshots}")
        print(f"loaded snapshot {step} from {args.snapshots}")
    else:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = jax.jit(model.init)(
                jax.random.PRNGKey(args.seed), jnp.array([[1.0, 0.0]]),
                jnp.array([120.0]), jnp.zeros((1, 1, 4, 4, 10, 56, 5)),
                jnp.zeros((1, 1, 51)).at[0, 0, 0].set(1.0),
                jnp.zeros((1, 1, 4, 4, 10, 47, 2)))
    params = jax.device_put(params, jax.devices()[0])

    bundle = ModelBundle(model=model, params=dict(params))
    written = transfer_style(bundle, args.composition, args.styles, args.out)
    for path in written:
        print(path)


if __name__ == "__main__":
    main()
