#!/usr/bin/env bash
# Round-4 queue 4 — align-stage probes on top of queue3's partial-overlap
# feat stage: the new opt-in inlier input channels (descriptor distance +
# reciprocity residual), the truncated inlier pyramid, and the gate-in-train
# combo. Chained behind queue3 via pid file; everything TPU-serialized.
#
#   E2a: extras=dist            (cheap channel, unidirectional matcher)
#   E2b: extras=dist,recip      (soft gate signal, bidirectional matcher)
#   E2c: extras=dist,recip + mutual gate tol 0.6 in the train forward
#   E3:  inlier_num_layers=2    (perf probe's quality arm)
# Each is evaluated on {full, p0.7, p0.5} raw + p0.7 gate (E2c also p0.5
# gate: its deploy config is gated).
# Also: redo the e0a_full_gate eval whose artifact save crashed on the
# mid-run module edit (metrics were printed: succ 1.000 / RRE 0.582).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4
exec > >(tee -a logs_r4/queue4.log) 2>&1

if [ -f /tmp/q3.pid ]; then
  PREV=$(cat /tmp/q3.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
fi

COMMON=(--dataset_type Synthetic --num_points 1024 --feat_len 3
        --rot_mag 30 --trans_mag 1.0 --thres_radius 0.9)
TRAIN=(-bs 8 --num_workers 4 --summary_every 100000)
CURR=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)
GATE=(--mutual_check true --mutual_check_tol 0.6)
ROBUST=(--synthetic_p_keep 0.7 --synthetic_noise 0.02)
P05=(--synthetic_p_keep 0.5 --synthetic_noise 0.02)

FEAT_CKPT=$(ls -d logs_r4/*feat_po5mask/ckpt 2>/dev/null | tail -1)
[ -n "$FEAT_CKPT" ] || FEAT_CKPT=logs_r3/staged_po/260817_185849_feat/ckpt
echo "feat ckpt: $FEAT_CKPT"

step() { echo "=== [$(date +%H:%M:%S)] $* ==="; }
die()  { echo "FATAL: $*"; exit 1; }

train_align() {  # $1 name, rest: extra flags; sets $CKPT
  local name=$1; shift
  local start; start=$(date +%s)
  step "train $name"
  python train.py --pipeline align --logdir logs_r4 --name "$name" \
      --max_epochs 80 -v -5 --synthetic_train_size 256 \
      --num_train_reg_iter 2 --resume "$FEAT_CKPT" \
      "${COMMON[@]}" "${TRAIN[@]}" "${CURR[@]}" "$@" \
      > "logs_r4/$name.train.log" 2>&1 \
      || die "train $name failed (see logs_r4/$name.train.log)"
  CKPT=$(ls -d logs_r4/*"$name"/ckpt 2>/dev/null | tail -1)
  [ -n "$CKPT" ] || die "no ckpt dir for $name"
  [ "$(stat -c %Y "$CKPT/model_best.msgpack")" -ge "$((start - 60))" ] \
      || die "stale checkpoint for $name: $CKPT"
  echo "-> $CKPT"
}

evaluate() {  # $1 outname, $2 ckpt, rest: extra flags
  local name=$1 ckpt=$2; shift 2
  step "eval $name"
  python test.py --pipeline align --resume "$ckpt/model_best.msgpack" \
      --synthetic_eval_size 128 --clip_weight_thresh 0.05 \
      --eval_save_path "logs_r4/$name" "${COMMON[@]}" "$@" \
      > "logs_r4/$name.log" 2>&1 \
      || { echo "EVAL FAILED: $name"; return 1; }
  local summ
  summ=$(ls "logs_r4/$name"/*/summary_metrics.json 2>/dev/null | tail -1)
  [ -n "$summ" ] || { echo "NO SUMMARY: $name"; return 1; }
  echo "$name: $(cat "$summ")"
}

DIST=(--inlier_extra_feats dist)
BOTH=(--inlier_extra_feats dist,recip)

train_align align_xdist "${DIST[@]}";              CKPT_2A=$CKPT
train_align align_xboth "${BOTH[@]}";              CKPT_2B=$CKPT
train_align align_xboth_gate "${BOTH[@]}" "${GATE[@]}"; CKPT_2C=$CKPT
train_align align_inl2 --inlier_num_layers 2;      CKPT_3=$CKPT

# E2a / E2b / E3: raw on all rungs + gated p0.7 (their model flags must be
# repeated at eval — the param tree depends on them)
for probe in "e2a:$CKPT_2A:${DIST[*]}" "e2b:$CKPT_2B:${BOTH[*]}" \
             "e3:$CKPT_3:--inlier_num_layers 2"; do
  IFS=: read -r tag ckpt flags <<<"$probe"
  # shellcheck disable=SC2086
  evaluate "${tag}_full_raw" "$ckpt" $flags
  # shellcheck disable=SC2086
  evaluate "${tag}_p07_raw"  "$ckpt" $flags "${ROBUST[@]}"
  # shellcheck disable=SC2086
  evaluate "${tag}_p05_raw"  "$ckpt" $flags "${P05[@]}"
  # shellcheck disable=SC2086
  evaluate "${tag}_p07_gate" "$ckpt" $flags "${ROBUST[@]}" "${GATE[@]}"
done

# E2c deploys gated
evaluate e2c_full_gate "$CKPT_2C" "${BOTH[@]}" "${GATE[@]}"
evaluate e2c_p07_gate  "$CKPT_2C" "${BOTH[@]}" "${ROBUST[@]}" "${GATE[@]}"
evaluate e2c_p05_gate  "$CKPT_2C" "${BOTH[@]}" "${P05[@]}" "${GATE[@]}"

# redo of the crashed artifact save (round-3 staged_po ckpt, full rung, gate)
evaluate e0a_full_gate_redo logs_r4/260819_001128_align_p05gate/ckpt "${GATE[@]}"

step "queue4 done"
