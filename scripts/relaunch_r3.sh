#!/bin/bash
# Round-3 fleet relaunch after the host reboot (2026-08-21 05:56 UTC).
#
# State at launch (see VERDICT.md + docs/LIGHTSOUT_DEBUG.md):
#   - puzzle15 500/500, puzzle24 496/496, sokoban 981/1000: done/near-done
#   - lightsout7_r3: itr 99.5k, update 199, plateaued at pred 19.85 vs
#     oracle 21.55 -- min-backup selection bias; resume WITH --double_q
#   - cube3_w07: 442/1000 solved, resume
#   - sokoban: 19 unsolved deep states, memory-sized retry (B=256, 8M pool)
#   - puzzle35: itr 721k, loss ~0.37 plateau; resume with --double_q
#   - puzzle48: itr 158k of 2M; resume with --double_q
#
# bench.py pauses background jobs via logs/tpu_jobs.pids; keep it
# authoritative: truncate here, append every launched pid (ADVICE r2).
set -u
cd /root/repo

log() { echo "$(date -u +%H:%M:%S) $*"; }

PIDFILE=logs/tpu_jobs.pids
: > "$PIDFILE"

# 1. lightsout7: resume the plateaued net with double-Q labeling.
nohup python -m deepcubea_tpu.cli.train --env lightsout7 --nnet_name lightsout7_r3 \
  --batch_size 1000 --states_per_update 500000 --loss_thresh 1.0 --back_max 50 \
  --max_update_steps 200 --update_method astar --scramble_pool -1 --num_test 1000 \
  --max_itrs 1000000 --double_q --save_dir saved_models >> logs/lo7_train_r3dq.log 2>&1 &
echo $! >> "$PIDFILE"; log "lightsout7_r3 double-Q resume pid $!"
sleep 60

# 2. cube3 w=0.7 full-1000 campaign (resume from 442/1000)
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
  --model saved_models/cube3_r2/current --env cube3 --weight 0.7 --batch_size 10000 \
  --instances 2 --pool_capacity 16777216 --table_capacity 33554432 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 3000 \
  --results_dir results/cube3_w07 --resume >> logs/cube3_w07_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "cube3_w07 solve pid $!"
sleep 60

# 3. sokoban: retry the 19 unsolved states. batch_size is the pop width, so
#    the node budget is max_iters*batch_size*4 ~= 33M vs an 8M pool; fits
#    HBM at 1 instance (the 12 GB OOM config is documented in RUNBOOK.md).
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/sokoban/test/data_0.pkl \
  --model saved_models/sokoban/current --env sokoban --weight 0.8 --batch_size 256 \
  --instances 1 --stream --max_iters 32768 --pool_capacity 8388608 \
  --table_capacity 16777216 --max_probes 6 --approx_pop \
  --results_dir results/sokoban --resume >> logs/sokoban_retry_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "sokoban retry pid $!"
sleep 60

# 4. puzzle35 trainer resume with double-Q (loss plateau 0.37 @ 721k itrs)
nohup python -m deepcubea_tpu.cli.train --env puzzle35 --states_per_update 50000000 \
  --batch_size 10000 --nnet_name puzzle35 --max_itrs 1000000 --loss_thresh 1.0 \
  --back_max 1000 --max_update_steps 200 --plateau_promote 3 --scramble_pool -1 \
  --num_test 10000 --double_q --save_dir saved_models >> logs/puzzle35_train_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle35 train pid $!"
sleep 60

# 5. puzzle48 trainer resume with double-Q (158k of 2M itrs)
nohup python -m deepcubea_tpu.cli.train --env puzzle48 --nnet_name puzzle48 \
  --states_per_update 50000000 --batch_size 10000 --max_itrs 2000000 \
  --loss_thresh 1.0 --back_max 1000 --max_update_steps 200 --plateau_promote 3 \
  --scramble_pool -1 --num_test 1000 --double_q --save_dir saved_models \
  >> logs/puzzle48_train_r3.log 2>&1 &
echo $! >> "$PIDFILE"; log "puzzle48 train pid $!"

log "all relaunched"
