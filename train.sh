#!/bin/bash
# Reference-parity training entry (reference: train.sh)
python coco.py train --dataset data "$@"
