#!/usr/bin/env python
"""Stage-level wall-clock breakdown of the batched transfer path (dev tool).

Times each stage of transfer_styles on the bench workload: host ingestion,
batched extraction dispatches, the fused apply program + fetch, and host-side
decode/.mid writing — so perf work targets the actual bottleneck. Run on the
real TPU (no args) after `make -C native`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EX = "/root/reference/examples/style transfer - midi"
COMPOSITIONS = [
    f"{_EX}/Sweet Dreams/original/Sweet Dreams.mid",
    f"{_EX}/Orient Express/original/Orient Express.mid",
    f"{_EX}/My Way/original/My Way (live).3.mid",
    f"{_EX}/It Must Have Been Love/original/It Must Have Been Love (live studio).1.mid",
    f"{_EX}/Sweet Dreams/original/Beat It.4.mid",
    f"{_EX}/Sweet Dreams/original/Equinox Part 4.mid",
]
STYLE = f"{_EX}/My Way/original/Angie.4.mid"


class StageTimer:
    def __init__(self):
        self.times = {}

    def __call__(self, name):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                timer.times[name] = (timer.times.get(name, 0.0)
                                     + time.perf_counter() - self.t0)
        return _Ctx()


def main():
    import jax

    from mst_tpu import transfer as tr
    from mst_tpu.transfer import ModelBundle, extract_styles, get_model_input
    st = StageTimer()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    bundle = bench.load_bundle()

    # warmup: compile everything once
    tr.transfer_styles(bundle, COMPOSITIONS, [STYLE], "/tmp/prof_warmup")

    n_rounds = 3
    for r in range(n_rounds):
        out = f"/tmp/prof_run_{r}"
        with st("1 ingest (read_midi+get_input)"):
            comps = [get_model_input(p)[1] for p in COMPOSITIONS]
            style_songs = [get_model_input(p)[1] for p in [STYLE]]
        with st("2 extract dispatch"):
            batches, locators = extract_styles(bundle, comps + style_songs)
        with st("3 extract block"):
            jax.block_until_ready([b.style for b in batches])
        with st("4 originals decode+write"):
            import numpy as np
            from mst_tpu.ops.rasterize import Rasterizer
            for i, comp in enumerate(comps):
                tr.save_channels(Rasterizer(comp.info), comp.pitched,
                                 comp.unpitched, comp.instruments,
                                 f"{out}/orig_{i}.mid")
            for j, s in enumerate(style_songs):
                tr.save_channels(Rasterizer(s.info), s.pitched, s.unpitched,
                                 s.instruments, f"{out}/style_{j}.mid")
        # apply jobs: replicate transfer_styles' grouping
        import numpy as np
        style_offset = np.cumsum([0] + [b.style.shape[0] for b in batches])
        import jax.numpy as jnp
        style_mat = (batches[0].style if len(batches) == 1 else
                     jnp.concatenate([b.style for b in batches], axis=0))
        comp_loc = locators[:len(comps)]
        style_loc = locators[len(comps):]
        jobs_per_group = {}
        for i, comp in enumerate(comps):
            g, row = comp_loc[i]
            jobs = jobs_per_group.setdefault(g, [])
            jobs.append((int(style_offset[comp_loc[i][0]]) + comp_loc[i][1],
                         row, comp.info, len(comp.instruments),
                         batches[g].n_bars[row], f"{out}/recon_{i}.mid"))
            for j, s in enumerate(style_songs):
                info = tr.combine_info(style_info=s.info,
                                       melody_info=comp.info)
                jobs.append((int(style_offset[style_loc[j][0]])
                             + style_loc[j][1], row, info,
                             len(s.instruments), batches[g].n_bars[row],
                             f"{out}/styled_{i}_{j}.mid"))
        for g, jobs in jobs_per_group.items():
            s_idx, c_idx, infos, n_inst, bars, paths = zip(*jobs)
            B = len(infos)
            Rb, T = batches[g].rhythm.shape[1], batches[g].rhythm.shape[2]
            Cb = tr._bucket(max(max(n_inst), 1), tr.CHANNEL_BUCKETS)

            with st("5 apply dispatch+fetch"):
                # the real ladder (incl. the live-block columns and the dense
                # fallback) — never duplicate its escalation logic here
                buf, capacity, pool = tr.run_fused_jobs(
                    bundle, list(infos), style_mat, batches[g].melody,
                    batches[g].rhythm, list(s_idx), list(c_idx),
                    list(n_inst), list(bars), Cb)
            with st("6 styled decode+write"):
                views = tr.unpack_job_records(buf, B, Cb, capacity, pool)
                for b, view in enumerate(views):
                    tr._decode_packed_job(infos[b], *view, Cb, Rb, T,
                                          paths[b])

    total = sum(st.times.values())
    print(f"\n{n_rounds} rounds, {len(COMPOSITIONS)} compositions, "
          f"1 style; total {total:.3f}s "
          f"({total / n_rounds / len(COMPOSITIONS) * 1000:.1f} ms/song)")
    for name in sorted(st.times):
        t = st.times[name]
        print(f"  {name:<32} {t / n_rounds * 1000:8.1f} ms/round "
              f"({100 * t / total:5.1f}%)")


if __name__ == "__main__":
    main()
