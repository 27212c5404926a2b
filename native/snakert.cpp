// snakert — native runtime substrate for snakeslam_tpu.
//
// C++ replacement for the runtime pieces the reference implements natively
// (reference: saiga's SynchronizedSlot/SynchronizedBuffer channels used at
// Snake/System/SnakeGlobal.h:56-58 and Snake/Preprocess/Input.h:45-48, the
// SpinLock/Semaphore of Snake/System/DelayedParallelMapOptimization.h:61-69,
// and the BinaryFile feature cache of Snake/Preprocess/FeatureDetector.cpp:
// 94-139).  Exposed through a plain C ABI for ctypes; the Python side
// (snakeslam_tpu/utils/native.py) falls back to pure Python when the shared
// library is unavailable.
//
// Build:  g++ -O2 -shared -fPIC -std=c++17 -o libsnakert.so snakert.cpp

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <new>

// ---------------------------------------------------------------------------
// bounded SPSC ring channel (token-passing; payloads stay in Python)
// ---------------------------------------------------------------------------

struct Ring {
    uint64_t* slots;
    int capacity;
    std::atomic<int> head;  // next pop
    std::atomic<int> tail;  // next push
    std::atomic<bool> closed;
    // blocking support
    std::mutex m;
    std::condition_variable cv_push;
    std::condition_variable cv_pop;
};

extern "C" {

Ring* ring_create(int capacity) {
    if (capacity < 1) capacity = 1;
    Ring* r = new (std::nothrow) Ring();
    if (!r) return nullptr;
    r->slots = new (std::nothrow) uint64_t[capacity + 1];
    if (!r->slots) { delete r; return nullptr; }
    r->capacity = capacity + 1;  // one slot kept empty
    r->head.store(0);
    r->tail.store(0);
    r->closed.store(false);
    return r;
}

void ring_destroy(Ring* r) {
    if (!r) return;
    delete[] r->slots;
    delete r;
}

static inline int ring_next(const Ring* r, int i) {
    return (i + 1) % r->capacity;
}

// unlocked core ops — called either standalone (followed by a fenced
// notify, see the public try_ wrappers) or while already holding r->m
// inside the blocking loops
static inline int ring_push_core(Ring* r, uint64_t value) {
    int tail = r->tail.load(std::memory_order_relaxed);
    int next = ring_next(r, tail);
    if (next == r->head.load(std::memory_order_acquire)) return 0;
    r->slots[tail] = value;
    r->tail.store(next, std::memory_order_release);
    return 1;
}

static inline int ring_pop_core(Ring* r, uint64_t* out) {
    int head = r->head.load(std::memory_order_relaxed);
    if (head == r->tail.load(std::memory_order_acquire)) return 0;
    *out = r->slots[head];
    r->head.store(ring_next(r, head), std::memory_order_release);
    return 1;
}

// Lock-then-unlock before notify: a blocked waiter checks its predicate
// while holding r->m, so acquiring the mutex here (after the state change)
// serializes against that re-check — without it, a state change landing
// between the waiter's predicate check and its wait() is a lost wakeup.
static inline void ring_signal(Ring* r, std::condition_variable& cv) {
    { std::lock_guard<std::mutex> lk(r->m); }
    cv.notify_one();
}

// returns 1 on success, 0 when full
int ring_try_push(Ring* r, uint64_t value) {
    if (!ring_push_core(r, value)) return 0;
    ring_signal(r, r->cv_pop);
    return 1;
}

// returns 1 on success, 0 when empty
int ring_try_pop(Ring* r, uint64_t* out) {
    if (!ring_pop_core(r, out)) return 0;
    ring_signal(r, r->cv_push);
    return 1;
}

// blocking push with timeout (ms); 1 = pushed, 0 = timeout, -1 = closed
int ring_push(Ring* r, uint64_t value, int timeout_ms) {
    if (ring_try_push(r, value)) return 1;
    std::unique_lock<std::mutex> lk(r->m);
    auto deadline = std::chrono::steady_clock::now()
        + std::chrono::milliseconds(timeout_ms);
    while (true) {
        if (r->closed.load()) return -1;
        if (ring_push_core(r, value)) {
            lk.unlock();
            r->cv_pop.notify_one();
            return 1;
        }
        if (r->cv_push.wait_until(lk, deadline) == std::cv_status::timeout) {
            if (!ring_push_core(r, value)) return 0;
            lk.unlock();
            r->cv_pop.notify_one();
            return 1;
        }
    }
}

// blocking pop with timeout (ms); 1 = popped, 0 = timeout, -1 = closed+empty
int ring_pop(Ring* r, uint64_t* out, int timeout_ms) {
    if (ring_try_pop(r, out)) return 1;
    std::unique_lock<std::mutex> lk(r->m);
    auto deadline = std::chrono::steady_clock::now()
        + std::chrono::milliseconds(timeout_ms);
    while (true) {
        if (ring_pop_core(r, out)) {
            lk.unlock();
            r->cv_push.notify_one();
            return 1;
        }
        if (r->closed.load()) return -1;
        if (r->cv_pop.wait_until(lk, deadline) == std::cv_status::timeout) {
            if (!ring_pop_core(r, out)) return 0;
            lk.unlock();
            r->cv_push.notify_one();
            return 1;
        }
    }
}

void ring_close(Ring* r) {
    r->closed.store(true);
    r->cv_pop.notify_all();
    r->cv_push.notify_all();
}

int ring_size(Ring* r) {
    int head = r->head.load();
    int tail = r->tail.load();
    int d = tail - head;
    return d >= 0 ? d : d + r->capacity;
}

// ---------------------------------------------------------------------------
// binary feature cache (fd_bufferToFile parity)
// format: magic "SNKF" | uint32 version | uint32 n
//         n * { 2*f64 uv | i32 octave | f32 angle | 32*u8 descriptor }
// ---------------------------------------------------------------------------

static const uint32_t FEAT_MAGIC = 0x464B4E53u;  // "SNKF"
static const uint32_t FEAT_VERSION = 1;

int features_write(const char* path, int n, const double* uv,
                   const int32_t* octave, const float* angle,
                   const uint8_t* desc) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    uint32_t hdr[3] = {FEAT_MAGIC, FEAT_VERSION, (uint32_t)n};
    int ok = fwrite(hdr, sizeof(hdr), 1, f) == 1
        && fwrite(uv, sizeof(double) * 2, n, f) == (size_t)n
        && fwrite(octave, sizeof(int32_t), n, f) == (size_t)n
        && fwrite(angle, sizeof(float), n, f) == (size_t)n
        && fwrite(desc, 32, n, f) == (size_t)n;
    fclose(f);
    return ok ? 0 : -2;
}

int features_count(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint32_t hdr[3];
    if (fread(hdr, sizeof(hdr), 1, f) != 1 || hdr[0] != FEAT_MAGIC) {
        fclose(f);
        return -2;
    }
    fclose(f);
    return (int)hdr[2];
}

int features_read(const char* path, int n, double* uv, int32_t* octave,
                  float* angle, uint8_t* desc) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint32_t hdr[3];
    int ok = fread(hdr, sizeof(hdr), 1, f) == 1
        && hdr[0] == FEAT_MAGIC && (int)hdr[2] == n
        && fread(uv, sizeof(double) * 2, n, f) == (size_t)n
        && fread(octave, sizeof(int32_t), n, f) == (size_t)n
        && fread(angle, sizeof(float), n, f) == (size_t)n
        && fread(desc, 32, n, f) == (size_t)n;
    fclose(f);
    return ok ? 0 : -2;
}

}  // extern "C"
