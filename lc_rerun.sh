#!/bin/bash
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
echo "=== lifecycle rerun $(date -u +%H:%M:%S)"
# r15's merge recipe (12/5) is the known-to-fit disk profile on this box;
# the quantity under test is the AUTO serve budget lifting merge recall
export SPARK_GRAFT_LC_MERGE_ITERK=12 SPARK_GRAFT_LC_MERGE_ROUNDS=5
./run_tool.sh graft.tools.DescentLifecycle > /tmp/lc_r16b.log 2>&1
echo "=== lifecycle rerun done rc=$? $(date -u +%H:%M:%S)"
