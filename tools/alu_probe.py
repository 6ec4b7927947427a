import multiprocessing as mp, time, sys

def spin(n):
    s = 0
    for i in range(n):
        s += i * i
    return s

def bench(workers, n=12_000_000, reps=1):
    t0 = time.time()
    spin(n)
    t1 = time.time() - t0
    with mp.Pool(workers) as p:
        t0 = time.time()
        p.map(spin, [n] * workers)
        tw = time.time() - t0
    return workers * t1 / tw

if __name__ == "__main__":
    for w in (16, 32):
        print(f"{bench(w):.1f}x/{w}")
