#!/bin/bash
# Relaunch the round-2 TPU workload after an axon-tunnel outage.
#
# The tunnel (localhost:8082) went down ~2026-08-17 12:36 UTC, wedging the
# in-flight solve campaigns and trainers (dead client connections). This
# script waits for the tunnel to listen again, probes that a JAX client can
# actually initialize, then relaunches everything from its on-disk state:
# solve campaigns via --resume (results.pkl flushes incrementally),
# trainers from their newest checkpoint (cli.train auto-resumes).
#
# Launch order is by importance; 60 s stagger spreads the compile spikes.
set -u
cd /root/repo

log() { echo "$(date -u +%H:%M:%S) $*"; }

log "waiting for axon tunnel on :8082 ..."
while ! ss -tln | grep -q ":8082 "; do sleep 20; done
log "port up; probing JAX client init"
until timeout 180 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; do
  log "probe failed; retrying in 30s"
  sleep 30
done
log "TPU reachable; relaunching"

# bench.py pauses background jobs via logs/tpu_jobs.pids; make this file
# authoritative: truncate here, append every launched pid below (ADVICE r2)
PIDFILE=logs/tpu_jobs.pids
: > "$PIDFILE"

# 1. lightsout7 retrain from scratch with the closed-set A* explorer
#    (reference train.sh:68 hyperparameters; round-2 defect fix validation)
nohup python -m deepcubea_tpu.cli.train --env lightsout7 --nnet_name lightsout7_r3 \
  --batch_size 1000 --states_per_update 500000 --loss_thresh 1.0 --back_max 50 \
  --max_update_steps 200 --update_method astar --scramble_pool -1 --num_test 1000 \
  --max_itrs 1000000 --save_dir runs >> runs/lo7_train_r4.log 2>&1 &
echo $! >> "$PIDFILE"; log "lightsout7_r3 train pid $!"
sleep 60

# 2. puzzle48 training start (reference train.sh:57; 2M itrs — longest pole)
nohup python -m deepcubea_tpu.cli.train --env puzzle48 --nnet_name puzzle48 \
  --states_per_update 50000000 --batch_size 10000 --max_itrs 2000000 \
  --loss_thresh 1.0 --back_max 1000 --max_update_steps 200 --plateau_promote 3 \
  --scramble_pool -1 --num_test 1000 --save_dir runs >> runs/puzzle48_train.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle48 train pid $!"
sleep 60

# 3. cube3 w=0.7 full-1000 campaign (resume from 174/1000)
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
  --model saved_models/cube3_r2/current --env cube3 --weight 0.7 --batch_size 10000 \
  --instances 2 --pool_capacity 16777216 --table_capacity 33554432 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 3000 \
  --results_dir results/cube3_w07 --resume >> /tmp/cube3_solve7.log 2>&1 &
echo $! >> "$PIDFILE"; log "cube3_w07 solve pid $!"
sleep 60

# 4. puzzle24 campaign (resume from 200/496)
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/puzzle24/test/data_0.pkl \
  --model saved_models/puzzle24/current --env puzzle24 --weight 0.8 --batch_size 20000 \
  --instances 2 --pool_capacity 8388608 --table_capacity 16777216 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 1500 \
  --results_dir results/puzzle24 --resume >> /tmp/p24_solve.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle24 solve pid $!"
sleep 60

# 5. cube3 w=0.6 full-1000 campaign (resume from 525/1000)
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
  --model saved_models/cube3_r2/current --env cube3 --weight 0.6 --batch_size 10000 \
  --instances 2 --pool_capacity 16777216 --table_capacity 33554432 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 3000 \
  --results_dir results/cube3_r2 --resume >> /tmp/cube3_solve_r2.log 2>&1 &
echo $! >> "$PIDFILE"; log "cube3_r2 solve pid $!"
sleep 60

# 6. puzzle35 trainer resume (570k/1M itrs checkpointed)
nohup python -m deepcubea_tpu.cli.train --env puzzle35 --states_per_update 50000000 \
  --batch_size 10000 --nnet_name puzzle35 --max_itrs 1000000 --loss_thresh 1.0 \
  --back_max 1000 --max_update_steps 200 --plateau_promote 3 --scramble_pool -1 \
  --num_test 10000 --save_dir runs >> runs/puzzle35_train.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle35 train pid $!"

sleep 60

# 7. sokoban: retry the 19 unsolved states. batch_size is the pop width, so
#    the node budget is max_iters*batch_size*4 — the original B=4/16k-iter
#    retry capped at ~260k generated nodes and never touched its pool; this
#    config reaches ~33M generated against an 8M pool (fits HBM at 1 instance).
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/sokoban/test/data_0.pkl \
  --model saved_models/sokoban/current --env sokoban --weight 0.8 --batch_size 256 \
  --instances 1 --stream --max_iters 32768 --pool_capacity 8388608 \
  --table_capacity 16777216 --max_probes 6 --approx_pop \
  --results_dir results/sokoban --resume >> /tmp/sokoban_retry.log 2>&1 &
echo $! >> "$PIDFILE"; log "sokoban retry pid $!"

log "all relaunched"
