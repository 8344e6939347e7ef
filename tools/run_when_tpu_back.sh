#!/usr/bin/env bash
# The measurement queue parked while the TPU relay was down (see ROADMAP
# "Pending the chip"). Run items one at a time — ONE TPU process at a time.
set -x
cd "$(dirname "$0")/.."

# 0) liveness (bounded): prints the error JSON line if the relay is dead
timeout 360 python -c "import bench; print(bench._device_watchdog(300.0))"

# 1) kernel fast-path measurement (prescale + no-mask): standalone first
timeout 590 python tools/probe_pos_kernel.py
# 2) SD3 step, bf16 + int8 (expect <= 198.9 / 177.6 ms from the fast paths)
timeout 590 python tools/bench_sd3_int8.py both
# 3) full headline bench (fills the compile cache for the driver run)
timeout 590 python bench.py
# 4) on-chip kernel tier
FDSD_TEST_PLATFORM=axon timeout 590 python -m pytest tests -m tpu -q
# 5) re-attribute the int8 step
timeout 590 python tools/profile_step.py sd3i8 --iters 5 --top 0

# afterwards: update README/COVERAGE/ROADMAP numbers if they moved.
