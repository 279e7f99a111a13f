#!/bin/sh
# job m628 (run OUTSIDE the worker, fresh process): true cold warm-up +
# minimal program-set cache for the driver's bench (verdict r4 item 7).
#
# 1. Empty cache dir -> bench.py pays every remote compile of exactly
#    the headline program set: its JSON line then reports the TRUE cold
#    warmup_s (warmup_kind="cold-or-partial").
# 2. The populated dir IS the minimal cache bench.py needs; step 3 also
#    compiles the __graft_entry__ forward step into it so the driver's
#    single-chip compile-check hits too.
# 3. Replace the committed .jax_cache with this minimal set (the full
#    round-5 working cache stays on the build host; a fresh clone pays
#    cold once for anything beyond the bench+entry set).
set -e
cd "$(dirname "$0")/../.."
MIN=/tmp/mincache_r5
rm -rf "$MIN"; mkdir -p "$MIN"
JAX_COMPILATION_CACHE_DIR="$MIN" python bench.py
JAX_COMPILATION_CACHE_DIR="$MIN" python - <<'EOF'
import __graft_entry__ as g
fn, args = g.entry()
import jax
jax.jit(fn).lower(*args).compile()
print("entry() compiled into the minimal cache")
EOF
echo "minimal cache entries: $(ls "$MIN" | wc -l)"
echo "to ship: rm -rf .jax_cache && mv $MIN .jax_cache && git add -A .jax_cache"
