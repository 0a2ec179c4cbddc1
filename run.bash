#!/usr/bin/env bash
# Convenience batch-inference invocations (reference run.bash equivalent).
set -euo pipefail

# PIV-LiteFlowNet-en over a directory of *_img1/_img2 pairs
python run.py --model piv --version 1 -p \
    --input "${1:-./images/demo}" --output "${2:-./results}" \
    --batch_size "${BATCH:-4}" ${EXTRA_ARGS:-}

# sequential-frame mode example:
# python run.py --model piv -s 0 -n 1000 -i ./images/seq_dir -o ./results
# bf16 fast path:
# python run.py --model piv -p -i DIR -o OUT --bf16 --batch_size 8
