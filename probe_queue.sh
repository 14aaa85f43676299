#!/bin/bash
# Round-16 probe queue: waits for the lifecycle (PID $1), then runs the
# remaining probes one at a time (quiet-box discipline for canaries).
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
echo "=== queue: BeamBudgetRuleProbe $(date -u +%H:%M:%S)"
./run_tool.sh graft.tools.BeamBudgetRuleProbe > /tmp/br_r16.log 2>&1
echo "=== queue: PostingsMaintenanceScaling $(date -u +%H:%M:%S)"
./run_tool.sh graft.tools.PostingsMaintenanceScaling > /tmp/pm_r16.log 2>&1
echo "=== queue: UnigramScaling $(date -u +%H:%M:%S)"
./run_tool.sh graft.tools.UnigramScaling > /tmp/ug_r16.log 2>&1
echo "=== queue done $(date -u +%H:%M:%S)"
