#!/bin/bash
# Copy-paste augmentation A/B on the real DOTA_gsd50 sample (CPU backend):
# pos_cpA (off) vs pos_cpB (on), same budget/seeds, compared via posnet HBB
# infereval on val. Configs: 64px patches, 512/epoch, 10 epochs, regen every
# 4 epochs (see /tmp/cp_ab/pos_cp{A,B}.json; identical except copy_paste).
set -x
cd /root/repo
export MPP_PLATFORM=cpu

python main.py -p train -m posnet -c /tmp/cp_ab/pos_cpA.json -o \
  > /tmp/cp_ab/trainA.log 2>&1
echo "rc=$?" >> /tmp/cp_ab/trainA.log

python main.py -p train -m posnet -c /tmp/cp_ab/pos_cpB.json -o \
  > /tmp/cp_ab/trainB.log 2>&1
echo "rc=$?" >> /tmp/cp_ab/trainB.log

python main.py -p infereval -m posnet -c /tmp/cp_ab/pos_cpA.json -s val -o \
  > /tmp/cp_ab/evalA.log 2>&1
echo "rc=$?" >> /tmp/cp_ab/evalA.log

python main.py -p infereval -m posnet -c /tmp/cp_ab/pos_cpB.json -s val -o \
  > /tmp/cp_ab/evalB.log 2>&1
echo "rc=$?" >> /tmp/cp_ab/evalB.log

echo CP_AB_DONE >> /tmp/cp_ab/status.log
