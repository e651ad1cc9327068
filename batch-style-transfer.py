#!/usr/bin/env python
"""Batched style-transfer CLI: N compositions x M styles in grouped device
dispatches (the serving-shaped entry over mst_tpu.transfer.transfer_styles).

    python batch-style-transfer.py --compositions a.mid b.mid \
        --styles s1.mid s2.mid --out outputs/ [--snapshots snapshots/] [--cpu]

Unlike style-transfer.py (one composition, reference-parity layout), this
amortizes jit dispatches and fetches across the whole workload: all songs are
latent-extracted in grouped batched programs and every (reconstructed +
styled) job of a shape group runs as one fused device program — ~8 songs/sec
on one v5e chip with a trained snapshot, and the batch axis shards over a
device mesh's ``data`` axis for multi-chip serving.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--compositions", nargs="+", required=True)
    parser.add_argument("--styles", nargs="+", required=True)
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
    from mst_tpu.transfer import ModelBundle, transfer_styles

    model = StyleTransferModel()
    if args.snapshots:
        from mst_tpu.runtime.checkpoint import load_trained_params
        params, step = load_trained_params(model, args.snapshots,
                                           seed=args.seed)
        if params is None:
            raise SystemExit(f"no snapshots under {args.snapshots}")
        print(f"loaded snapshot {step} from {args.snapshots}")
    else:
        # structure demo: sparsified fresh init (a raw init fires every
        # velocity cell and can overflow the packed decode on long songs)
        from mst_tpu.transfer import demo_params
        params = demo_params(model, seed=args.seed)
    params = jax.device_put(params, jax.devices()[0])

    bundle = ModelBundle(model=model, params=dict(params))
    written = transfer_styles(bundle, args.compositions, args.styles,
                              args.out)
    for path in written:
        print(path)


if __name__ == "__main__":
    main()
