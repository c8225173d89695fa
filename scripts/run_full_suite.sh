#!/bin/bash
# Full-suite runner: sequential chunks, each under its own timeout (the whole
# suite exceeds the sandbox's 600 s shell cap — run via
#   nohup bash scripts/run_full_suite.sh > /tmp/full_suite.log 2>&1 &
# ).  Prints every chunk's pytest summary line plus any FAILED/ERROR test
# names, verifies every tests/test_*.py file is assigned to exactly one
# chunk, and exits nonzero with FULL_SUITE_FAILED if any chunk fails,
# times out, or a test file is uncovered.  FULL_SUITE_DONE is printed only
# on a genuinely green run.
cd /root/repo || exit 1

CHUNKS=(
  "A|tests/test_sharding.py tests/test_multihost.py tests/test_scale.py tests/test_augment.py tests/test_featurize.py tests/test_search.py tests/test_saliency.py tests/test_linear_probe.py tests/test_csv_dataset.py"
  "B|tests/test_pretrain.py tests/test_fsdp.py tests/test_distill.py"
  "C|tests/test_drivers.py tests/test_serve.py tests/test_convert_script.py"
  "D|tests/test_clip_model.py tests/test_full_model_oracle.py tests/test_grad_oracle.py tests/test_train_loop_oracle.py tests/test_model_wrapper.py tests/test_sharded_ckpt.py tests/test_prograd.py tests/test_promptsrc.py"
  "E|tests/test_kernel_grads.py tests/test_fused_mha.py tests/test_fused_mlp.py tests/test_flash_blocked.py tests/test_attention.py tests/test_int8.py"
  "F|tests/test_maple.py tests/test_fewshot.py tests/test_tpt.py tests/test_kgcoop.py tests/test_base_to_new.py tests/test_robustness.py tests/test_clip_adapter.py tests/test_tip_adapter.py"
  "G|tests/test_adaptive_eval.py tests/test_bitfit.py tests/test_calibration.py tests/test_checkpoint.py tests/test_data.py tests/test_feature_cache.py tests/test_image_conditioned.py tests/test_model_export.py tests/test_model_soup.py tests/test_moe.py tests/test_native.py tests/test_peft.py tests/test_pipeline.py tests/test_predict.py tests/test_prefetch.py"
  "H|tests/test_prompt.py tests/test_quickstart.py tests/test_resnet.py tests/test_retrieval.py tests/test_shards.py tests/test_siglip.py tests/test_sweep.py tests/test_token_pruning.py tests/test_tokenizer.py tests/test_tokenizer_golden.py tests/test_tokenizer_properties.py tests/test_train_step.py tests/test_trainer.py tests/test_vpt.py tests/test_zero_shot.py"
)

# -- completeness check: every test file must appear in exactly one chunk --
ALL_ASSIGNED=" "
for entry in "${CHUNKS[@]}"; do
  ALL_ASSIGNED+="${entry#*|} "
done
fail=0
for f in tests/test_*.py; do
  # tr-split then exact-line count: grep -o over the shared separator space
  # undercounts adjacent repeats (non-overlapping matches).
  n=$(tr ' ' '\n' <<<"$ALL_ASSIGNED" | grep -cxF "$f")
  if [ "$n" -eq 0 ]; then
    echo "UNCOVERED TEST FILE: $f (add it to a chunk in run_full_suite.sh)"
    fail=1
  elif [ "$n" -gt 1 ]; then
    echo "DUPLICATED TEST FILE: $f (listed $n times)"
    fail=1
  fi
done

for entry in "${CHUNKS[@]}"; do
  name=${entry%%|*}
  files=${entry#*|}
  chunk_log=/tmp/suite_chunk_${name}.log
  echo "=== chunk $name: $files"
  start=$(date +%s)
  timeout 720 python -m pytest $files -q >"$chunk_log" 2>&1
  rc=$?
  elapsed=$(( $(date +%s) - start ))
  # pytest's summary is the last non-empty line ("N passed, M skipped in Ss")
  summary=$(grep -v '^$' "$chunk_log" | tail -1)
  echo "chunk $name [${elapsed}s, rc=$rc]: $summary"
  if [ $rc -eq 124 ]; then
    echo "chunk $name TIMED OUT after 720s (log: $chunk_log)"
    fail=1
  elif [ $rc -ne 0 ]; then
    echo "chunk $name FAILED (log: $chunk_log):"
    grep -E '^(FAILED|ERROR)' "$chunk_log"
    fail=1
  fi
done

if [ $fail -ne 0 ]; then
  echo "FULL_SUITE_FAILED"
  exit 1
fi
echo "FULL_SUITE_DONE"
