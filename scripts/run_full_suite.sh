#!/bin/bash
cd /root/repo
for chunk in \
  "tests/test_sharding.py tests/test_multihost.py tests/test_scale.py tests/test_augment.py tests/test_featurize.py tests/test_search.py tests/test_saliency.py tests/test_linear_probe.py tests/test_csv_dataset.py" \
  "tests/test_pretrain.py tests/test_fsdp.py tests/test_distill.py" \
  "tests/test_drivers.py tests/test_serve.py tests/test_convert_script.py" \
  "tests/test_clip_model.py tests/test_full_model_oracle.py tests/test_grad_oracle.py tests/test_model_wrapper.py" \
  "tests/test_kernel_grads.py tests/test_fused_mha.py tests/test_fused_mlp.py tests/test_flash_blocked.py tests/test_attention.py tests/test_int8.py" \
  "tests/test_maple.py tests/test_fewshot.py tests/test_tpt.py tests/test_kgcoop.py tests/test_base_to_new.py tests/test_robustness.py tests/test_clip_adapter.py tests/test_tip_adapter.py"; do
  echo "=== chunk: $chunk"
  timeout 720 python -m pytest $chunk -q 2>&1 | tail -1
done
echo "=== chunk: D (everything else)"
timeout 720 python -m pytest tests/ -q \
  --ignore=tests/test_sharding.py --ignore=tests/test_multihost.py --ignore=tests/test_scale.py \
  --ignore=tests/test_augment.py --ignore=tests/test_featurize.py --ignore=tests/test_search.py \
  --ignore=tests/test_saliency.py --ignore=tests/test_linear_probe.py --ignore=tests/test_csv_dataset.py \
  --ignore=tests/test_pretrain.py --ignore=tests/test_fsdp.py --ignore=tests/test_distill.py \
  --ignore=tests/test_drivers.py --ignore=tests/test_serve.py --ignore=tests/test_convert_script.py \
  --ignore=tests/test_clip_model.py --ignore=tests/test_full_model_oracle.py --ignore=tests/test_grad_oracle.py \
  --ignore=tests/test_model_wrapper.py \
  --ignore=tests/test_kernel_grads.py --ignore=tests/test_fused_mha.py --ignore=tests/test_fused_mlp.py \
  --ignore=tests/test_flash_blocked.py --ignore=tests/test_attention.py --ignore=tests/test_int8.py \
  --ignore=tests/test_maple.py --ignore=tests/test_fewshot.py --ignore=tests/test_tpt.py \
  --ignore=tests/test_kgcoop.py --ignore=tests/test_base_to_new.py --ignore=tests/test_robustness.py \
  --ignore=tests/test_clip_adapter.py --ignore=tests/test_tip_adapter.py \
  2>&1 | tail -1
echo "FULL_SUITE_DONE"
