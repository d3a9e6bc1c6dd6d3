#!/usr/bin/env python
"""Post-deferred-dW sweeps: scan_unroll and n_frames_per_step (bench shapes)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ablate_deferred import time_g_step  # noqa: E402


def main():
    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    base = "use_labels=False,use_noise=True,fp16_run=True,deferred_dw=True"
    for unroll in (4, 8, 16):
        t, _ = time_g_step(base + f",scan_unroll={unroll}")
        print(f"unroll={unroll:<3d} K=1  g_step {t*1e3:7.1f} ms", flush=True)
    for k in (2, 4):
        t, _ = time_g_step(base + f",n_frames_per_step={k}")
        print(f"unroll=8   K={k}  g_step {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
