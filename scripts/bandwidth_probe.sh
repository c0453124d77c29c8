#!/bin/sh
# Measures this machine's own scaling ceilings, to contextualize the bench's
# two-parallelism-level efficiency number (BASELINE.md "Scaling methodology"):
#   - pure-compute scaling N -> 4N busy cores (register-bound spin)
#   - memory-bandwidth scaling N -> 4N busy cores (64 MB memcpy loop)
# A single-socket VM shares ONE memory bus across all vCPUs, so any
# bandwidth-bound workload scales sublinearly by construction; a real cluster
# at 4x the nodes multiplies buses along with cores. Measured here (2026-08-18,
# 32-vCPU sandbox): spin 0.94, memcpy 0.645 (7.4 -> 4.8 GB/s per core).
set -e
DUR=${DUR:-8}
LO=${LO:-2}
HI=${HI:-8}

cat > /tmp/_spin.py <<'EOF'
import time, sys
dur = float(sys.argv[1]); t0 = time.time(); c = 0; x = 1.0001
while time.time() - t0 < dur:
    for _ in range(10000): x = x * 1.0000001 % 7.7
    c += 1
print(c)
EOF

cat > /tmp/_mem.py <<'EOF'
import time, sys
dur = float(sys.argv[1])
a = bytearray(64*1024*1024); b = bytearray(64*1024*1024)
t0 = time.time(); c = 0
while time.time() - t0 < dur:
    b[:] = a
    c += 1
print(c*64/dur)   # MB/s for this process
EOF

run() { # $1 = script, $2 = nprocs -> prints sum of per-proc rates
  n=$(( $2 - 1 ))
  for i in $(seq 0 $n); do taskset -c $i python3 "$1" "$DUR" & done
  wait
}

echo "== spin (ops/proc) at $LO and $HI procs =="
run /tmp/_spin.py "$LO"
run /tmp/_spin.py "$HI"
echo "== memcpy (MB/s/proc) at $LO and $HI procs =="
run /tmp/_mem.py "$LO"
run /tmp/_mem.py "$HI"
echo "scaling efficiency N->4N for each = (sum@HI / sum@LO) / (HI/LO)"
