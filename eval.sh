#!/bin/bash
# Reference-parity evaluation entry (reference: eval.sh)
python coco.py evaluate --dataset data "$@"
