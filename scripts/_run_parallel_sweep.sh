#!/bin/bash
# r9 one-off: two concurrent fresh-JVM chunk streams over the remaining
# sweep names (the serial runner's ~2 min/query pace would overrun the
# session). Same verify_invariants.py subprocess contract as
# run_invariants.py; parts land in scripts/_inv_parts/part_*.json and the
# final artifact is produced by `run_invariants.py --remerge`.
set -u
SF=/root/repo/.fixtures/sf100
SF10=/root/repo/.fixtures/sf10
cd /root/repo

run_stream() {  # $1 = stream tag, $2 = file with one comma-list per line
  local k=0
  while IFS= read -r names; do
    [ -z "$names" ] && continue
    local out="scripts/_inv_parts/part_${1}$(printf %02d $k).json"
    timeout 3600 python scripts/verify_invariants.py --sf "$SF" \
      --only "$names" --out "$out" --driver-mem 14g \
      > "/tmp/sweep_${1}${k}.log" 2>&1
    if [ ! -f "$out" ]; then
      # split into single-query fresh JVMs (the runner's retry rule)
      local j=0
      for q in ${names//,/ }; do
        timeout 3600 python scripts/verify_invariants.py --sf "$SF" \
          --only "$q" --out "scripts/_inv_parts/part_${1}$(printf %02d $k)_${j}.json" \
          --driver-mem 14g > "/tmp/sweep_${1}${k}_${j}.log" 2>&1
        j=$((j+1))
      done
    fi
    echo "[$(date +%H:%M:%S)] stream $1 chunk $k done"
    k=$((k+1))
  done < "$2"
}

run_stream a /tmp/stream_a.txt &
A=$!
run_stream b /tmp/stream_b.txt &
B=$!
wait $A $B
echo "[$(date +%H:%M:%S)] both streams done"

# SUITE_SF10 pair-dump chunk at sf10, then the judge-named cluster dual
timeout 3600 python scripts/verify_invariants.py --sf "$SF10" \
  --only "$(cat /tmp/stream_sf10.txt)" \
  --out scripts/_inv_parts/part_sf10suite.json --driver-mem 14g \
  > /tmp/sweep_sf10suite.log 2>&1
echo "[$(date +%H:%M:%S)] sf10 suite done ($?)"
timeout 5400 python scripts/verify_invariants.py --sf "$SF" \
  --cluster-dual-sf "$SF10" --cluster-dual-only \
  --out scripts/_inv_parts/part_cluster.json --driver-mem 14g \
  > /tmp/sweep_cluster.log 2>&1
echo "[$(date +%H:%M:%S)] cluster dual done ($?)"
