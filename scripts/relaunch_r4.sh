#!/bin/bash
# Round-4 fleet relaunch (written at end of round 3).
#
# State at round-3 end (see docs/RESULTS.md round-3 section):
#   - puzzle15 500/500, puzzle24 496/496: COMPLETE
#   - lightsout7_r3: double-Q retrain past the min-backup wall; BWAS probe
#     solves at reference quality but most states still exhaust small
#     pools -- keep training, then run the 500-state campaign (job 6)
#   - cube3_w07: resuming campaign (~490+ solved at r3 end, 7 known-hard
#     states need the big-pool retry, job 7)
#   - sokoban: net retrain in flight (update ~57 -> target ~500 with
#     plateau promotion); 19 unsolved states wait for the better net
#   - puzzle35 (~800k itrs), puzzle48 (~250k of 2M): marathon trainers
#
# Usage: bash scripts/relaunch_r4.sh   (waits for the TPU, then launches)
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

# 1. lightsout7 double-Q trainer (auto-resumes)
nohup python -m deepcubea_tpu.cli.train --env lightsout7 --nnet_name lightsout7_r3 \
  --batch_size 1000 --states_per_update 500000 --loss_thresh 1.0 --back_max 50 \
  --max_update_steps 200 --update_method astar --scramble_pool -1 --num_test 1000 \
  --max_itrs 1000000 --double_q --save_dir saved_models >> logs/lo7_train_r3dq.log 2>&1 &
echo $! >> "$PIDFILE"; log "lightsout7 train pid $!"
sleep 60

# 2. cube3 w=0.7 campaign resume
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
  --model saved_models/cube3_r2/current --env cube3 --weight 0.7 --batch_size 10000 \
  --instances 2 --pool_capacity 16777216 --table_capacity 33554432 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 3000 \
  --results_dir results/cube3_w07 --resume >> logs/cube3_w07_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "cube3_w07 solve pid $!"
sleep 60

# 3. sokoban: retraining COMPLETED at end of round 3 (2M itrs, loss
#    1.31 -> 0.13, depth-1000 GBFS 31% -> 72.7%). Run the 19-state retry
#    with the new net (launched at r3 end; resume-safe):
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/sokoban/test/data_0.pkl \
  --model saved_models/sokoban/current --env sokoban --weight 0.8 --batch_size 256 \
  --instances 1 --stream --max_iters 32768 --pool_capacity 8388608 \
  --table_capacity 16777216 --max_probes 6 --approx_pop \
  --results_dir results/sokoban --resume >> logs/sokoban_retry_r3b.log 2>&1 &
echo $! >> "$PIDFILE"; log "sokoban retry pid $!"
sleep 60

# 4. puzzle35 trainer resume. The reference budget (1M itrs, train.sh:45)
#    completed at end of round 3; deep-band GBFS was still climbing fast
#    under double-Q (6.6% -> 34% in the final day), so extend to 1.5M.
#    ALTERNATIVELY: probe first (bench.py --domain puzzle35 --num_states 6)
#    and go straight to the 500-state campaign if the probe solves.
nohup python -m deepcubea_tpu.cli.train --env puzzle35 --states_per_update 50000000 \
  --batch_size 10000 --nnet_name puzzle35 --max_itrs 1500000 --loss_thresh 1.0 \
  --back_max 1000 --max_update_steps 200 --plateau_promote 3 --scramble_pool -1 \
  --num_test 10000 --double_q --save_dir saved_models >> logs/puzzle35_train_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle35 train pid $!"
sleep 60

# 5. puzzle48 trainer resume
nohup python -m deepcubea_tpu.cli.train --env puzzle48 --nnet_name puzzle48 \
  --states_per_update 50000000 --batch_size 10000 --max_itrs 2000000 \
  --loss_thresh 1.0 --back_max 1000 --max_update_steps 200 --plateau_promote 3 \
  --scramble_pool -1 --num_test 1000 --double_q --save_dir saved_models \
  >> logs/puzzle48_train_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle48 train pid $!"

log "all relaunched"

# When the lightsout7 oracle MAD drops below ~2 / probes solve >80%:
# 6. lightsout7 500-state campaign (4M pool; the 2M probe pool exhausted):
#   python -m deepcubea_tpu.cli.solve --states /root/reference/data/lightsout7/test/data_0.pkl \
#     --model saved_models/lightsout7_r3/current --env lightsout7 --weight 0.2 \
#     --batch_size 1000 --instances 4 --pool_capacity 4194304 --table_capacity 8388608 \
#     --max_probes 6 --approx_pop --stream --sort_by_h --max_iters 8000 \
#     --results_dir results/lightsout7 --resume
# After the campaign: cube3 w=0.7 residue (the 7 pool-exhaustion states):
# 7.
#   python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
#     --model saved_models/cube3_r2/current --env cube3 --weight 0.7 --batch_size 10000 \
#     --instances 1 --pool_capacity 33554432 --table_capacity 67108864 --max_probes 6 \
#     --approx_pop --stream --max_iters 6000 --results_dir results/cube3_w07 --resume
# After the sokoban net reaches ~update 300+: retry its 19 states:
# 8.
#   python -m deepcubea_tpu.cli.solve --states /root/reference/data/sokoban/test/data_0.pkl \
#     --model saved_models/sokoban/current --env sokoban --weight 0.8 --batch_size 256 \
#     --instances 1 --stream --max_iters 32768 --pool_capacity 8388608 \
#     --table_capacity 16777216 --max_probes 6 --approx_pop \
#     --results_dir results/sokoban --resume
