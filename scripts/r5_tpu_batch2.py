#!/usr/bin/env python
"""Round-5 TPU batch 2: voice channel/segment isolation + sampler-kit
decomposition, one process to amortize the compile-service warmup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_batch2.py
"""
import sys

sys.path.insert(0, "/root/repo/scripts")

import r5_voice_seg
import r5_kit_parts

if __name__ == "__main__":
    r5_voice_seg.main()
    r5_kit_parts.main()
