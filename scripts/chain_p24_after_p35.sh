#!/bin/bash
# Round-5 sequencer: the p35 and p24 quality passes both want a 32M-slot
# pool, and two of those do not fit HBM together (RUNBOOK r4 rule), so
# start puzzle24's residue pass only after puzzle35's babysitter exits
# (its done-pattern "merged:" reached).
set -u
cd /root/repo

while pgrep -f "babysit_solve.sh logs/p35_residue_r5.log" > /dev/null; do
  sleep 60
done
echo "$(date -u +%H:%M:%S) p35 residue babysitter gone; launching p24 residue" >> logs/chain.log

setsid nohup bash scripts/babysit_solve.sh logs/p24_residue_r5.log "merged:" 900 -- \
  python scripts/resolve_residue.py --env puzzle24 --results_dir results/puzzle24 \
  --states /root/reference/data/puzzle24/test/data_0.pkl \
  --model saved_models/puzzle24/current --nonopt \
  --tag r5q --weight 0.8 --batch_size 20000 --instances 1 --max_iters 3000 \
  --pool_capacity 33554432 --table_capacity 67108864 --approx_pop < /dev/null > /dev/null 2>&1 &
echo "$(date -u +%H:%M:%S) p24 residue babysit pgid $!" >> logs/chain.log
