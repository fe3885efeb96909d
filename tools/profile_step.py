"""Profile the bench stage-1 train step on TPU and summarize op costs.

Usage: python tools/profile_step.py [--stage2]
Writes the trace under /tmp/svgir_trace and prints the top ops by self time.
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)


def main():
    sys.path.insert(0, '/root/repo')
    if '--stage2' in sys.argv:
        import bench_stage2
        step_fn, args_ = bench_stage2.build()
        def step():
            out = step_fn(*args_)
            return out[-1]['loss']
    else:
        import bench
        step1, params = bench.build()
        def step():
            loss, grads = step1(params)
            return (loss, grads)

    out = step()
    jax.block_until_ready(out)
    for _ in range(3):
        out = step()
    jax.block_until_ready(out)

    jax.profiler.start_trace('/tmp/svgir_trace')
    for _ in range(10):
        out = step()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # newest trace file
    files = sorted(glob.glob('/tmp/svgir_trace/**/*.trace.json.gz',
                             recursive=True))
    with gzip.open(files[-1], 'rt') as f:
        trace = json.load(f)

    # device-side complete events: sum duration by name (entries named
    # "0","1",... are jit instances, not ops — skip; sum named fusions)
    by_name = defaultdict(float)
    count = defaultdict(int)
    extra = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') != 'X':
            continue
        name = ev.get('name', '')
        if name.isdigit():
            continue
        by_name[name] += ev.get('dur', 0)
        count[name] += 1
        args = ev.get('args') or {}
        ln = args.get('long_name') or args.get('hlo_op') or ''
        if ln and name not in extra:
            extra[name] = str(ln)

    total = sum(by_name.values())
    print(f'total traced op-us (10 steps): {total:.0f}')
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:45]:
        print(f'{dur/10/1000:9.3f} ms/step x{count[name]:4d}  {name[:60]}'
              f'  | {extra.get(name, "")[:160]}')


if __name__ == '__main__':
    main()
