#!/usr/bin/env bash
# Root cause of the reference's flat ~3.2-3.4% high-SNR BP error floor
# (reports/report_opt.csv rows -1.0/-0.5/0.0: FER 0.0315/0.0320/0.0337).
#
# Finding (round 5): the floor is a DATA RACE, not decoding. The reference's
# Tanner graph assigns node ids from a global mutable `static int
# Node::counter` (algo/bp.h:13,15,32,39,67 — incremented twice per node via
# the base+derived constructors) while the 8-thread harness
# (experiment.h:125-139) builds a fresh graph per trial on every thread
# concurrently. Racing `counter++` can regress the counter and hand
# DUPLICATE uuids to nodes within one graph; the unordered_map-keyed
# message passing then cross-wires messages and the frame fails — at a rate
# independent of SNR, which is exactly the published flat floor. The rate
# is timing/platform dependent (data race): ~0.05-0.13% on this machine,
# 3.2-3.4% on the author's.
#
# This script demonstrates, building probes against the UNMODIFIED
# reference headers (patched copies are generated on the fly in /tmp):
#   1. single-threaded reference BP @ 0 dB  -> FER 0.0000 (no floor)
#   2. the reference's own 8-thread harness -> FER > 0 (the race)
#   3. 32 threads -> rate grows with contention
#   4. one-line fix (`thread_local` counter) -> FER 0.0000 under 8 threads
#   5. (secondary) `long double`==double platforms (e.g. ARM macOS) add a
#      small genuine phi-saturation NaN floor (~0.15% @ -1 dB), removed by
#      clamping phi — see prof_bp_floor_native.py / prof_bp_floor.py.
#
# Note the reference's per-trial seeding (mt19937 rnd(trial_index+1),
# experiment.h:97) makes results thread-count-independent in exact
# arithmetic — any thread-count dependence is itself proof of a bug.
#
# Usage: REF=/root/reference scripts/prof/prof_bp_floor_race.sh
set -euo pipefail
REF="${REF:-/root/reference}"
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
HERE="$(cd "$(dirname "$0")" && pwd)"

cp "$HERE/bp_floor_probe_mt.cpp" "$WORK/probe_mt.cpp"
mkdir -p "$WORK/data" && cp "$REF"/data/optimalH.txt "$WORK/data/"

# patched copy 1: thread_local counter (race removed, nothing else changed)
mkdir -p "$WORK/reffix/algo"
sed 's/static int counter;/static thread_local int counter;/;
     s/^int Node::counter = 0;/thread_local int Node::counter = 0;/' \
    "$REF/algo/bp.h" > "$WORK/reffix/algo/bp.h"

# patched copy 2: long double -> double (ARM macOS numerics)
mkdir -p "$WORK/ref64/algo"
sed 's/long double/double/g' "$REF/algo/bp.h" > "$WORK/ref64/algo/bp.h"

cd "$WORK"
g++ -O3 -pthread -std=c++17 -I"$REF" probe_mt.cpp -o probe_mt
g++ -O3 -pthread -std=c++17 -Ireffix -I"$REF" probe_mt.cpp -o probe_fix
g++ -O3 -pthread -std=c++17 -Iref64 -I"$REF" probe_mt.cpp -o probe_64

echo "== unmodified reference BP (x87 long double) =="
./probe_mt 0.0 10000 1
./probe_mt 0.0 10000 8
./probe_mt 0.0 10000 8
./probe_mt 0.0 10000 32
echo "== thread_local Node::counter (one-line race fix) =="
./probe_fix 0.0 10000 8
echo "== long double == double (ARM-like numerics) =="
./probe_64 0.0 10000 1
./probe_64 -1.0 10000 1
./probe_64 -1.0 10000 8
