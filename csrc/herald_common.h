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
// Workers claim task indices via an atomic counter, so uneven tasks still
// balance.
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
        if (threads_.empty() || n_tasks == 1) {
            for (int i = 0; i < n_tasks; i++) fn(i);
            return;
        }
        std::unique_lock<std::mutex> lk(m_);
        fn_ = fn;
        n_tasks_ = n_tasks;
        next_.store(0, std::memory_order_relaxed);
        remaining_ = n_tasks;
        epoch_++;
        cv_.notify_all();
        done_cv_.wait(lk, [this] { return remaining_ == 0; });
    }

private:
    void loop() {
        uint64_t seen = 0;
        std::unique_lock<std::mutex> lk(m_);
        for (;;) {
            cv_.wait(lk, [&] { return stop_ || epoch_ != seen; });
            if (stop_) return;
            seen = epoch_;
            int n = n_tasks_;
            lk.unlock();
            int done = 0;
            for (;;) {
                int i = next_.fetch_add(1, std::memory_order_relaxed);
                if (i >= n) break;
                fn_(i);
                done++;
            }
            lk.lock();
            remaining_ -= done;
            if (remaining_ == 0) done_cv_.notify_all();
        }
    }

    std::vector<std::thread> threads_;
    std::mutex m_;
    std::condition_variable cv_, done_cv_;
    std::function<void(int)> fn_;
    std::atomic<int> next_{0};
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
