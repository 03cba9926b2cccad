#!/bin/bash
# Deferred TPU jobs (the axon relay tunnel died late in round 2 — see
# memory note tpu-numerics-gotchas).  Run these once real-TPU access is
# back, each via nohup + log polling (NEVER timeout-kill a TPU process):
#
# 1. Regenerate results/ artifacts with the shipped round-2 weights:
#    TAU=0.8 GAMMA=0.7 nohup python -u scripts/make_artifacts.py sphere \
#        > /tmp/art_sphere.log 2>&1 &
#    TAU=0.8 GAMMA=0.7 nohup python -u scripts/make_artifacts.py tori \
#        > /tmp/art_tori.log 2>&1 &        # (after sphere finishes)
#
# 2. Sanity-run the bench (now also reports train_steps_per_s):
#    nohup python -u bench.py > /tmp/bench.log 2>&1 &
#
# 3. TPU-hardware regression tests:
#    SURFACENET_TPU_TESTS=1 nohup python -m pytest tests/test_tpu_only.py \
#        -q > /tmp/tpu_tests.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
TAU=0.8 GAMMA=0.7 python -u scripts/make_artifacts.py sphere
TAU=0.8 GAMMA=0.7 python -u scripts/make_artifacts.py tori
python -u bench.py
SURFACENET_TPU_TESTS=1 python -m pytest tests/test_tpu_only.py -q
