#!/bin/sh
# job r631 (run OUTSIDE the worker): regenerate EVERY performance-table
# row under ONE protocol — fresh-subprocess, shipped defaults, best-of-3
# distinct seeds (verdict r4 item 6).  Two subprocesses: the quick
# configs (1 2 4 5) and the long 4K config 3.  Output lines land in
# /tmp/r631_*.json; the builder folds them into bench_configs_out.json
# with round-5 stamps and runs bench/readme_table.py.
set -e
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
python bench/configs.py 1 2 4 5 --reps 3 | tee /tmp/r631_quick.json
python bench/configs.py 3 --reps 2 | tee /tmp/r631_c3.json
echo done
