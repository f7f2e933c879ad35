#!/bin/bash
# Round-5 fleet relaunch (draft written mid-round-4; see end-of-round
# commit for final state).
#
# Round-4 state summary:
#   - puzzle15 500/500, puzzle24 496/496, sokoban 1000/1000 (B=2 config
#     beats reference nodes AND length), puzzle35 campaign done/near-done
#   - cube3 w=0.7: 882+ solved; 32M-pool retry for the exhaustion tail
#   - lightsout7_r3: recipe validated (docs/LIGHTSOUT_DEBUG.md r4), needs
#     ~800 more updates to the reference's 2082-update endpoint, then the
#     500-state campaign (job 5 below)
#   - puzzle48: update ~77/517-equivalent, 390k/2M itrs — the marathon
#
# OPS RULES LEARNED (r3/r4): never SIGSTOP jobs mid-stream (wedges the
# axon tunnel for every client); kill+resume instead. After any pause
# window, check job log mtimes and restart silent jobs. Run bench.py
# only on a quiet chip.
set -u
cd /root/repo

log() { echo "$(date -u +%H:%M:%S) $*"; }

log "waiting for axon tunnel on :8082 ..."
while ! ss -tln | grep -q ":8082 "; do sleep 20; done
until timeout 180 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; do
  log "probe failed; retrying in 30s"; sleep 30
done
log "TPU reachable; relaunching"

PIDFILE=logs/tpu_jobs.pids
: > "$PIDFILE"

# 1. lightsout7 trainer to its 1M-itr / ~update-2000 endpoint
nohup python -m deepcubea_tpu.cli.train --env lightsout7 --nnet_name lightsout7_r3 \
  --batch_size 1000 --states_per_update 500000 --loss_thresh 1.0 --back_max 50 \
  --max_update_steps 200 --update_method astar --scramble_pool -1 --num_test 1000 \
  --max_itrs 1000000 --double_q --save_dir saved_models >> logs/lo7_train_r3dq.log 2>&1 &
echo $! >> "$PIDFILE"; log "lightsout7 train pid $!"
sleep 60

# 2. puzzle48 marathon trainer
nohup python -m deepcubea_tpu.cli.train --env puzzle48 --nnet_name puzzle48 \
  --states_per_update 50000000 --batch_size 10000 --max_itrs 2000000 \
  --loss_thresh 1.0 --back_max 1000 --max_update_steps 200 --plateau_promote 3 \
  --scramble_pool -1 --num_test 1000 --double_q --save_dir saved_models \
  >> logs/puzzle48_train_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle48 train pid $!"
sleep 60

# 3. cube3 w=0.7 32M-pool retry, if any states remain unsolved
#    (checks results.pkl; instances=1, solo-friendly)
if python - <<'EOF'
import pickle, sys
r = pickle.load(open('results/cube3_w07/results.pkl','rb'))
sys.exit(0 if any(s is None for s in r['solutions']) else 1)
EOF
then
  nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
    --model saved_models/cube3_r2/current --env cube3 --weight 0.7 --batch_size 10000 \
    --instances 1 --pool_capacity 33554432 --table_capacity 67108864 --max_probes 6 \
    --approx_pop --stream --max_iters 6000 --results_dir results/cube3_w07 --resume \
    >> logs/cube3_w07_r5.log 2>&1 &
  echo $! >> "$PIDFILE"; log "cube3 32M retry pid $!"
fi

log "all relaunched"

# LATER, when the lightsout7 probe gate passes
# (python bench.py --domain lightsout7 --num_states 8 solves >=7/8):
# 5. lightsout7 500-state campaign:
#   python -m deepcubea_tpu.cli.solve --states /root/reference/data/lightsout7/test/data_0.pkl \
#     --model saved_models/lightsout7_r3/current --env lightsout7 --weight 0.2 \
#     --batch_size 1000 --instances 4 --pool_capacity 8388608 --table_capacity 16777216 \
#     --max_probes 6 --approx_pop --stream --sort_by_h --max_iters 12000 \
#     --results_dir results/lightsout7 --resume
# 6. puzzle48 campaign when its deep-band eval leaves 0%:
#   python -m deepcubea_tpu.cli.solve --states /root/reference/data/puzzle48/test/data_0.pkl \
#     --model saved_models/puzzle48/current --env puzzle48 --weight 0.6 --batch_size 20000 \
#     --instances 1 --pool_capacity 16777216 --table_capacity 33554432 --max_probes 6 \
#     --approx_pop --stream --sort_by_h --max_iters 4000 \
#     --results_dir results/puzzle48 --resume

# 7. puzzle35 quality pass (round-4 finding, docs/RESULTS.md r4): the
#    campaign's solutions are uniformly +2..+10 vs the reference on ~417
#    states because (a) approx_pop inflates the C++-rule proof bound
#    (premature termination: exact pop alone recovered 8 moves on the
#    worst state) and (b) the hard tail exhausts a 16M pool (identical
#    node counts at w=0.8/0.85/0.9 = pool-bound). Re-solve longer-than-
#    reference states with exact pop + 32M pool:
#   python scripts/resolve_residue.py --env puzzle35 \
#     --results_dir results/puzzle35 \
#     --states /root/reference/data/puzzle35/test/data_0.pkl \
#     --model saved_models/puzzle35/current \
#     --ref_output /root/reference/results/puzzle35/output.txt \
#     --min_excess 2 --tag r5q --weight 0.8 --batch_size 20000 \
#     --max_iters 4000 --pool_capacity 33554432 --table_capacity 67108864
#   (resolve_residue passes --approx_pop never; cli default is exact pop)
# 8. sokoban: if results.pkl < 1000 solved after the B=2 re-campaign,
#    finish with: scripts/resolve_residue.py --env sokoban --unsolved
#    --weight 0.8 --batch_size 16 --instances 8 --max_iters 16384
#    --pool_capacity 1048576 --table_capacity 2097152 ... then
#    scripts/merge_results.py with results/sokoban/results_old.pkl as
#    fallback for anything still open.
