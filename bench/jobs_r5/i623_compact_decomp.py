# job i623: decompose _compact cost at the headline's top rung and
# price the primitives for a sort-free stable-partition compactor
# (round-5 roofline follow-up: compaction is 0.53 s raw / ~26% of the
# headline wall; the 20-operand sort network is the suspect).
# Primitives priced here decide the design:
#   (a) full _compact(3.93M -> 2.36M, tail_sorted)   [prod baseline]
#   (b) _multisort_state alone (20-operand stable sort)
#   (c) 2-operand (key, iota) stable sort
#   (d) segment_sum on the 1.57M dropped tail: sorted vs UNSORTED
#   (e) jnp.cumsum i32 at 3.93M
#   (f) bit-serial router: 22 masked-shift stages over a [20, n] stack
t_all = time.perf_counter()
import functools
import jax.numpy as jnp
from win32_raytracer_tpu.persistent import (
    PathState, _compact, _multisort_state, _SORT_PIX_LIM)

N = 3932160
K_NEW = 2359296
N_PIX = 983040  # headline chunk pixels (1200*800 at kpp 4 -> 960000; pad)
rng = np.random.RandomState(5)
alive_frac = 0.58
alive_np = np.zeros(N, bool)
alive_np[rng.choice(N, int(N * alive_frac), replace=False)] = True
pix_np = np.arange(N, dtype=np.int32) // 4  # ascending, kpp=4 style

def mk_state():
    def f3():
        return jnp.asarray(rng.rand(3, N).astype(np.float32))
    def f1():
        return jnp.asarray(rng.rand(1, N).astype(np.float32))
    def i1(lo, hi):
        return jnp.asarray(rng.randint(lo, hi, (1, N)).astype(np.int32))
    return PathState(
        origin=f3(), direction=f3(), time=f1(), throughput=f3(),
        radiance_sum=f3(), depth=i1(0, 12), sample=i1(0, 25),
        pixel=jnp.asarray(pix_np[None]),
        path_alive=jnp.asarray(alive_np[None]),
        s_base=i1(0, 100), s_quota=i1(1, 26))

st = mk_state()
accum = jnp.zeros((3, N_PIX), jnp.float32)

def timeit(name, fn, reps=5):
    r = fn()  # warm/compile
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best

# (a) production compact, both modes
timeit("a1 _compact tail_sorted", lambda: _compact(
    st, accum, k_new=K_NEW, lanes_per_pixel=jnp.int32(4),
    tail_sorted=True))
timeit("a2 _compact unsorted-mode", lambda: _compact(
    st, accum, k_new=K_NEW, lanes_per_pixel=jnp.int32(4),
    tail_sorted=False))

# (b) the 20-operand stable sort alone
key_c = ((~st.path_alive[0]).astype(jnp.int32) * _SORT_PIX_LIM
         + st.pixel[0])

@jax.jit
def sort20(st, key):
    ks, cols = _multisort_state(st, key, skip=("path_alive",))
    return ks, cols["origin"][0]
timeit("b  multisort 20-op", lambda: sort20(st, key_c))

# (c) 2-operand argsort-style
@jax.jit
def sort2(key):
    return jax.lax.sort((key, jax.lax.iota(jnp.int32, N)),
                        dimension=0, num_keys=1, is_stable=True)
timeit("c  sort 2-op (key,iota)", lambda: sort2(key_c))

# (d) segment_sum flush on a 1.57M tail: sorted vs unsorted flag
T = N - K_NEW
tail_rad = jnp.asarray(rng.rand(T, 3).astype(np.float32))
tail_pix_sorted = jnp.asarray(np.sort(rng.randint(
    0, N_PIX, T)).astype(np.int32))
tail_pix_unsorted = jnp.asarray(rng.randint(
    0, N_PIX, T).astype(np.int32))

@functools.partial(jax.jit, static_argnames=("srt",))
def seg(rad, pix, srt):
    return jax.ops.segment_sum(rad, pix, num_segments=N_PIX,
                               indices_are_sorted=srt)
timeit("d1 segsum sorted flag+data", lambda: seg(
    tail_rad, tail_pix_sorted, True))
timeit("d2 segsum unsorted", lambda: seg(
    tail_rad, tail_pix_unsorted, False))
timeit("d3 segsum sorted data, unsorted flag", lambda: seg(
    tail_rad, tail_pix_sorted, False))

# (e) cumsum at full width
@jax.jit
def csum(a):
    return jnp.cumsum(a)
timeit("e  cumsum i32 3.93M", lambda: csum(
    st.path_alive[0].astype(jnp.int32)))

# (f) bit-serial router stages over a [20, N] f32 stack (one direction)
@functools.partial(jax.jit, static_argnames=("n_stages",))
def route(mat, shift, valid, n_stages):
    for k in range(n_stages):
        s = 1 << k
        sh_mat = jnp.pad(mat[:, s:], ((0, 0), (0, s)))
        sh_shift = jnp.pad(shift[s:], (0, s))
        sh_valid = jnp.pad(valid[s:], (0, s))
        arrive = (sh_valid > 0) & (((sh_shift >> k) & 1) > 0)
        leave = (valid > 0) & (((shift >> k) & 1) > 0)
        mat = jnp.where(arrive[None, :], sh_mat, mat)
        shift = jnp.where(arrive, sh_shift, shift)
        valid = jnp.where(arrive, jnp.int32(1),
                          jnp.where(leave, jnp.int32(0), valid))
    return mat, shift, valid

mat = jnp.asarray(rng.rand(20, N).astype(np.float32))
alive_i = st.path_alive[0].astype(jnp.int32)
ca = jnp.cumsum(alive_i)
shift0 = jnp.arange(N, dtype=jnp.int32) - (ca - 1)
timeit("f  router 22 stages [20,N]", lambda: route(
    mat, shift0, alive_i, 22))

# light correctness probe: route an index row, check the compacted
# head equals the alive positions in order
idx_mat = jnp.arange(N, dtype=jnp.float32)[None, :]
routed, _, rvalid = route(idx_mat, shift0, alive_i, 22)
n_alive = int(alive_np.sum())
got = np.asarray(routed[0, :n_alive]).astype(np.int64)
want = np.nonzero(alive_np)[0][:n_alive]
ok = np.array_equal(got, want)
print(f"router correctness head[{n_alive}]: {ok}", flush=True)
assert ok
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
