#!/bin/bash
# r10 repair sweep: fresh-JVM runs for the 24 never-run declared queries,
# the 6 dead-context/job-abort retries from the r9 sweep, the
# q_pipeline_curation dual re-run under the quote-aware rewriter, and the
# q_dedup_cluster_star sf10 lost-task retry. Parts are written tmp->mv
# (ADVICE r9 #2: a timeout kill mid-dump must not leave a truncated part
# that suppresses the retry) and named part_zr10_* so sorted-merge order
# places them after every r9 part.
set -u
SF=/root/repo/.fixtures/sf100
SF10=/root/repo/.fixtures/sf10
cd /root/repo
mkdir -p scripts/_inv_parts

run_chunks() {  # $1 = stream tag, $2 = file with one comma-list per line
  local k=0
  while IFS= read -r names; do
    [ -z "$names" ] && continue
    local out="scripts/_inv_parts/part_zr10_${1}$(printf %02d $k).json"
    local sf="$SF"
    case "$names" in sf10:*) sf="$SF10"; names="${names#sf10:}";; esac
    timeout 3600 python scripts/verify_invariants.py --sf "$sf" \
      --only "$names" --out "$out.tmp" --driver-mem 14g --cpus 16 \
      > "/tmp/r10_${1}${k}.log" 2>&1
    if python -c "import json,sys; json.load(open('$out.tmp'))" 2>/dev/null; then
      mv "$out.tmp" "$out"
    else
      rm -f "$out.tmp"
      local j=0
      for q in ${names//,/ }; do
        local so="scripts/_inv_parts/part_zr10_${1}$(printf %02d $k)_${j}.json"
        timeout 3600 python scripts/verify_invariants.py --sf "$sf" \
          --only "$q" --out "$so.tmp" --driver-mem 14g --cpus 16 \
          > "/tmp/r10_${1}${k}_${j}.log" 2>&1
        python -c "import json; json.load(open('$so.tmp'))" 2>/dev/null \
          && mv "$so.tmp" "$so" || rm -f "$so.tmp"
        j=$((j+1))
      done
    fi
    echo "[$(date +%H:%M:%S)] stream $1 chunk $k done"
    k=$((k+1))
  done < "$2"
}

run_chunks a /tmp/r10_stream_a.txt &
A=$!
run_chunks b /tmp/r10_stream_b.txt &
B=$!
wait $A $B
echo "[$(date +%H:%M:%S)] r10 repair streams done"
