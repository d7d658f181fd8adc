// herald_common — shared native utilities for the herald_tpu host planners
// (csrc/herald_sched.cc, csrc/herald_cache_planner.cc).
//
// TPU-native replacement for the reference's laia/include/thread_pool.h
// (future-based pool with Wait()); here a persistent pool with an
// index-claiming parallel_for, because both planners run fixed-fanout
// phases per batch and per-phase thread spawning is measurable overhead.

#pragma once

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace herald {

using key_t_ = int64_t;

// Persistent thread pool: parallel_for(n, fn) runs fn(0..n-1), blocking.
// Workers claim task indices via an epoch-tagged CAS counter, so uneven
// tasks balance AND a worker that wakes late for an old epoch can never
// steal (or execute out-of-range) indices of a newer epoch: the claim
// succeeds only if the counter still carries the worker's epoch tag.
// Each worker also snapshots the task closure under the lock, so the
// main thread's next assignment to fn_ cannot tear a running call.
class Pool {
public:
    explicit Pool(int n_threads) {
        for (int i = 0; i < n_threads; i++)
            threads_.emplace_back([this] { loop(); });
    }

    ~Pool() {
        {
            std::lock_guard<std::mutex> lk(m_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto &t : threads_) t.join();
    }

    void parallel_for(int n_tasks, const std::function<void(int)> &fn) {
        if (n_tasks <= 0) return;
        if (threads_.empty() || n_tasks == 1
            || uint64_t(n_tasks) >= kIdxMask) {
            for (int i = 0; i < n_tasks; i++) fn(i);
            return;
        }
        std::unique_lock<std::mutex> lk(m_);
        fn_ = fn;
        n_tasks_ = n_tasks;
        remaining_ = n_tasks;
        epoch_++;
        claim_.store(epoch_ << kIdxBits, std::memory_order_relaxed);
        cv_.notify_all();
        done_cv_.wait(lk, [this] { return remaining_ == 0; });
    }

private:
    static constexpr int kIdxBits = 20;   // up to ~1M tasks per epoch
    static constexpr uint64_t kIdxMask = (uint64_t(1) << kIdxBits) - 1;

    void loop() {
        uint64_t seen = 0;
        std::unique_lock<std::mutex> lk(m_);
        for (;;) {
            cv_.wait(lk, [&] { return stop_ || epoch_ != seen; });
            if (stop_) return;
            seen = epoch_;
            std::function<void(int)> fn = fn_;   // snapshot under the lock
            uint64_t n = uint64_t(n_tasks_);
            lk.unlock();
            int done = 0;
            uint64_t cur = claim_.load(std::memory_order_relaxed);
            for (;;) {
                if ((cur >> kIdxBits) != seen) break;   // newer epoch owns
                uint64_t idx = cur & kIdxMask;
                if (idx >= n) break;
                if (!claim_.compare_exchange_weak(
                        cur, cur + 1, std::memory_order_relaxed))
                    continue;                    // cur refreshed by CAS
                fn(int(idx));
                done++;
                cur = claim_.load(std::memory_order_relaxed);
            }
            lk.lock();
            // done > 0 implies parallel_for(seen) is still waiting (its
            // remaining_ cannot have hit zero without these completions),
            // so the decrement always lands in the right epoch
            if (done) {
                remaining_ -= done;
                if (remaining_ == 0) done_cv_.notify_all();
            }
        }
    }

    std::vector<std::thread> threads_;
    std::mutex m_;
    std::condition_variable cv_, done_cv_;
    std::function<void(int)> fn_;
    std::atomic<uint64_t> claim_{0};
    int n_tasks_ = 0, remaining_ = 0;
    uint64_t epoch_ = 0;
    bool stop_ = false;
};

// murmur3 finalizer: the open-addressing tables below need full-width
// mixing because embedding IDs are contiguous per table
inline uint64_t hash64(uint64_t x) {
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33; return x;
}

} // namespace herald
