#!/bin/bash
# Session-3 relaunch of the round-2 workload (previous session ended with
# all jobs down; tunnel is up, runs/ was wiped with the container).
#
# Changes vs relaunch_after_outage.sh:
#  - drop the cube3 w=0.6 campaign: the weight study (docs/RESULTS.md) shows
#    w=0.7 is the configuration that reaches reference solution quality
#    (avg 21.33, 60% optimal vs reference 21.35/~60%); w=0.6 plateaus at
#    53% optimal, so finishing it would spend chip time on a result that
#    cannot meet the quality bar.
#  - puzzle35 resumes from a runs/ seeded out of saved_models/puzzle35
#    (runs/ is gitignored and did not survive the container restart).
#  - sokoban retry first: 19 states from 981/1000, small footprint,
#    completes a whole domain.
set -u
cd /root/repo
log() { echo "$(date -u +%H:%M:%S) $*"; }

mkdir -p runs
[ -d runs/puzzle35 ] || cp -r saved_models/puzzle35 runs/puzzle35

# 1. sokoban: retry the 19 unsolved states with a 16x iteration budget
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/sokoban/test/data_0.pkl \
  --model saved_models/sokoban/current --env sokoban --weight 0.8 --batch_size 4 \
  --instances 1 --stream --max_iters 16384 --pool_capacity 2097152 \
  --table_capacity 4194304 --max_probes 6 --approx_pop \
  --results_dir results/sokoban --resume >> runs/sokoban_retry.log 2>&1 &
log "sokoban retry pid $!"
sleep 30

# 2. puzzle24 campaign (resume from 200)
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/puzzle24/test/data_0.pkl \
  --model saved_models/puzzle24/current --env puzzle24 --weight 0.8 --batch_size 20000 \
  --instances 2 --pool_capacity 8388608 --table_capacity 16777216 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 1500 \
  --results_dir results/puzzle24 --resume >> runs/p24_solve.log 2>&1 &
log "puzzle24 solve pid $!"
sleep 30

# 3. cube3 w=0.7 full-1000 campaign (resume from 174/1000)
nohup python -m deepcubea_tpu.cli.solve --states /root/reference/data/cube3/test/data_0.pkl \
  --model saved_models/cube3_r2/current --env cube3 --weight 0.7 --batch_size 10000 \
  --instances 2 --pool_capacity 16777216 --table_capacity 33554432 --max_probes 6 \
  --approx_pop --stream --sort_by_h --max_iters 3000 \
  --results_dir results/cube3_w07 --resume >> runs/cube3_solve7.log 2>&1 &
log "cube3_w07 solve pid $!"
sleep 30

# 4. lightsout7 retrain from scratch with the goal-retiring A* explorer
#    (round-2 defect fix, validated 24/24 optimal on lightsout5)
nohup python -m deepcubea_tpu.cli.train --env lightsout7 --nnet_name lightsout7_r3 \
  --batch_size 1000 --states_per_update 500000 --loss_thresh 1.0 --back_max 50 \
  --max_update_steps 200 --update_method astar --scramble_pool -1 --num_test 1000 \
  --max_itrs 1000000 --save_dir runs >> runs/lo7_train_r4.log 2>&1 &
log "lightsout7_r3 train pid $!"
sleep 30

# 5. puzzle35 trainer resume (525k/1M itrs)
nohup python -m deepcubea_tpu.cli.train --env puzzle35 --states_per_update 50000000 \
  --batch_size 10000 --nnet_name puzzle35 --max_itrs 1000000 --loss_thresh 1.0 \
  --back_max 1000 --max_update_steps 200 --plateau_promote 3 --scramble_pool -1 \
  --num_test 10000 --save_dir runs >> runs/puzzle35_train.log 2>&1 &
log "puzzle35 train pid $!"
sleep 30

# 6. puzzle48 training start (reference train.sh:57; 2M itrs - longest pole)
nohup python -m deepcubea_tpu.cli.train --env puzzle48 --nnet_name puzzle48 \
  --states_per_update 50000000 --batch_size 10000 --max_itrs 2000000 \
  --loss_thresh 1.0 --back_max 1000 --max_update_steps 200 --plateau_promote 3 \
  --scramble_pool -1 --num_test 1000 --save_dir runs >> runs/puzzle48_train.log 2>&1 &
log "puzzle48 train pid $!"

log "all relaunched"
