"""Steady-state serving probe: ms/frame vs stream length and chunk size.

bench.py's 12-frame stream runs only 2 chunks of 6 per pass, so pipeline
fill (host prep of chunk 1) and drain (fetch of the last chunk) are ~1/3 of
wall time and the measured fps underestimates steady-state serving. This
probe measures the same workload at longer streams and several chunk sizes
to pick bench.py's honest steady-state configuration.

Run on the tunneled chip: python perf/steady_state.py   (ONE client at a time)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.serving_modes import build_memory


def main():
    memory, frames, poses = build_memory()
    eval_frames = [(frames[i][0], frames[i][1]) for i in (6, 7, 8)]

    # warm every shape bucket (single-frame program)
    for rgb, depth in eval_frames:
        memory.localise(rgb, depth, outlier_removal_config=None)

    for batch in (6, 12):
        # warm the chunk program at this batch size
        memory.localise_many(eval_frames * batch, batch=batch,
                             outlier_removal_config=None)
        for reps in (4, 12, 24):
            stream = eval_frames * reps
            n = len(stream)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                memory.localise_many(stream, batch=batch,
                                     outlier_removal_config=None)
                best = min(best, (time.perf_counter() - t0) / n * 1000)
            print(f"batch={batch:2d} frames={n:3d}  {best:6.1f} ms/frame "
                  f"({1000 / best:5.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
