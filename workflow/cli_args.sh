#!/bin/bash
# Assemble the cspc-tpu flag list from params.sh (reference cli_args.sh:7-18).

MY_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )
source "${MY_DIR}/params.sh"

CLI_ARGS="--depth=$MAXDEPTH \
 --maxslots=$MAXSLOTS \
 --cellsize=$CELLSIZE \
 --blocksize=$BLOCKSIZE \
 --nsamples=$NSAMPLES \
 --entropy=$ENTROPY \
 --seed=$SEED \
 --nslots=$NSLOTS \
 --ncells=$NCELLS \
 --index=$SLOTINDEX \
 --field=$FIELD \
 --hash=$HASH \
 --backend=$BACKEND"

if [[ "$1" == "--export" ]]; then
  export CLI_ARGS
fi
