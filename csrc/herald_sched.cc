// herald_sched — lookahead embedding scheduler (C++17, no external deps).
//
// TPU-native re-design of the reference Laia/Topk scheduler
// (laia/src/laia_scheduler.cc, laia/src/topk_scheduler.cc): a background
// thread walks the epoch's sample x table ID matrix one global batch ahead
// of training, simulates every worker's embedding cache, assigns each sample
// to the worker whose cache already holds most of its IDs (load-balanced),
// and emits a per-worker communication plan — the rows each worker must
// flush/refresh because other workers will read them this batch.
//
// Differences from the reference, by design:
//  * one process drives all local TPU devices, so a single queue carries
//    every worker's (plan, assignment) per batch — no shared-memory IPC
//    fan-out (reference share_mem.h) is needed in-process;
//  * the top-K most-reused tables are profiled from the ID matrix at start
//    instead of hard-coded per dataset (topk_scheduler.cc:151-165), with an
//    optional caller-provided order for exact reference parity;
//  * exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Performance design (this is the part the reference solved with top-K
// filtering + shm fan-out; a TPU step is ~ms, so the planner must be too):
//  * residency is ONE interleaved bitmask array: masks_[key] has bit z set
//    iff worker z's cache holds `key` valid. Scoring and comm-plan
//    construction then cost one random memory probe per (sample, key)
//    instead of nrank probes into nrank separate bitmaps — the probes are
//    the dominant cost (DRAM latency bound), so this is ~nrank x faster
//    and uses key_space bytes instead of nrank * key_space.
//  * a persistent thread pool replaces per-phase thread spawns.
//  * the epoch ID matrix is borrowed from the caller (numpy buffer), not
//    copied — at Criteo scale the copy alone is multi-GB.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC herald_sched.cc -o libherald_sched.so -lpthread

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <numeric>
#include <thread>
#include <vector>
#include <chrono>

#include "herald_common.h"

namespace herald {

// ---------------------------------------------------------------------
// LRU cache simulator. Semantics match the reference MiniLRUCache
// (laia/include/mini_lru_cache.h): entries carry a validity bit; `get`
// return codes distinguish hit(-1) / outdated-hit(-2) / insert(0) /
// insert-evicting-fresh(1) so the scheduler can book pull/push traffic.
// Validity lives in the scheduler's shared interleaved mask array (bit
// `bit_` of masks[key]); updates use atomic RMW because replay runs one
// thread per worker and sibling workers own other bits of the same word.
//
// Unlike the reference's list+unordered_map, storage is a pre-allocated
// node pool (intrusive doubly-linked list by index) plus an open-addressing
// hash with backward-shift deletion: zero allocation in steady state, so
// replay threads never contend on malloc.
// ---------------------------------------------------------------------
template <class MaskT>
class LruSim {
public:
    void init(size_t capacity, MaskT *masks, int bit) {
        cap_ = capacity;
        masks_ = masks;
        bit_ = MaskT(1) << bit;
        nodes_.resize(cap_ + 1);
        free_.resize(cap_ + 1);
        for (size_t i = 0; i <= cap_; i++)
            free_[i] = int32_t(cap_ - i);      // pop order 0,1,2,...
        size_t want = 16;
        while (want < 2 * (cap_ + 2)) want <<= 1;
        slots_.assign(want, -1);
        hmask_ = want - 1;
        head_ = tail_ = -1;
        size_ = 0;
    }

    bool check(key_t_ key) const { return (masks_[key] & bit_) != 0; }

    int get(key_t_ key) {
        size_t s = probe(key);
        if (slots_[s] == -1) return insert_at(key, s);
        int32_t n = slots_[s];
        int res = nodes_[n].valid ? -1 : -2;
        detach(n);
        push_front(n);
        nodes_[n].valid = true;
        set_bit(key);
        return res;
    }

    void outdate(key_t_ key) {
        size_t s = probe(key);
        if (slots_[s] != -1) {
            nodes_[slots_[s]].valid = false;
            clear_bit(key);
        }
    }

    std::vector<key_t_> valid_keys() const {
        std::vector<key_t_> out;
        out.reserve(size_);
        for (int32_t n = head_; n != -1; n = nodes_[n].next)
            if (nodes_[n].valid) out.push_back(nodes_[n].key);
        std::sort(out.begin(), out.end());
        return out;
    }

private:
    struct Node { key_t_ key; int32_t prev, next; bool valid; };

    // slot holding `key`, or the empty slot where it would be inserted
    size_t probe(key_t_ key) const {
        size_t h = hash64(uint64_t(key)) & hmask_;
        while (slots_[h] != -1 && nodes_[slots_[h]].key != key)
            h = (h + 1) & hmask_;
        return h;
    }

    int insert_at(key_t_ key, size_t s) {
        int32_t n = free_.back();
        free_.pop_back();
        nodes_[n] = {key, -1, -1, true};
        slots_[s] = n;
        push_front(n);
        set_bit(key);
        if (++size_ > cap_) {
            int32_t v = tail_;
            key_t_ vkey = nodes_[v].key;
            bool was_valid = nodes_[v].valid;
            detach(v);
            erase_slot(probe(vkey));
            free_.push_back(v);
            size_--;
            clear_bit(vkey);
            return was_valid ? 1 : 0;
        }
        return 0;
    }

    // backward-shift deletion keeps linear probing tombstone-free
    void erase_slot(size_t i) {
        size_t j = i;
        for (;;) {
            j = (j + 1) & hmask_;
            if (slots_[j] == -1) break;
            size_t k = hash64(uint64_t(nodes_[slots_[j]].key)) & hmask_;
            if (((j - k) & hmask_) >= ((j - i) & hmask_)) {
                slots_[i] = slots_[j];
                i = j;
            }
        }
        slots_[i] = -1;
    }

    void detach(int32_t n) {
        auto &nd = nodes_[n];
        if (nd.prev != -1) nodes_[nd.prev].next = nd.next; else head_ = nd.next;
        if (nd.next != -1) nodes_[nd.next].prev = nd.prev; else tail_ = nd.prev;
    }

    void push_front(int32_t n) {
        nodes_[n].prev = -1;
        nodes_[n].next = head_;
        if (head_ != -1) nodes_[head_].prev = n; else tail_ = n;
        head_ = n;
    }

    void set_bit(key_t_ k) {
        __atomic_fetch_or(&masks_[k], bit_, __ATOMIC_RELAXED);
    }
    void clear_bit(key_t_ k) {
        __atomic_fetch_and(&masks_[k], MaskT(~bit_), __ATOMIC_RELAXED);
    }

    std::vector<Node> nodes_;
    std::vector<int32_t> free_, slots_;
    size_t hmask_ = 0, size_ = 0, cap_ = 0;
    int32_t head_ = -1, tail_ = -1;
    MaskT *masks_ = nullptr;
    MaskT bit_ = 0;
};

// ---------------------------------------------------------------------
// Scheduler
// ---------------------------------------------------------------------
struct BatchPlan {
    std::vector<key_t_> assign;               // [nrank * mbs] sample indices
    std::vector<std::vector<key_t_>> plans;   // per worker, sorted unique keys
};

struct ISched {
    virtual ~ISched() = default;
    virtual void start() = 0;
    virtual bool pop(BatchPlan &out) = 0;
    virtual size_t queue_length() = 0;
    virtual void perf(long out[4]) const = 0;
    virtual long iter_time_us() const = 0;
    virtual void phase_times(long out[4]) const = 0;
};

// Non-template shared state: config, output queue, traffic counters.
class SchedBase : public ISched {
public:
    SchedBase(const key_t_ *ids, int64_t num_samples, int num_tables,
              int nrank, int mbs, int64_t batch_num, int epochs,
              int top_k, const int *table_order, int n_threads,
              int queue_cap)
        : ids_(ids), num_samples_(num_samples), num_tables_(num_tables),
          nrank_(nrank), mbs_(mbs), batch_num_(batch_num), epochs_(epochs),
          top_k_(top_k > 0 ? std::min<int>(top_k, num_tables) : num_tables),
          n_threads_(std::max(1, n_threads)), queue_cap_(queue_cap),
          pool_(std::max(1, n_threads)) {
        key_t_ max_key = 0;
        for (int64_t i = 0; i < num_samples_ * num_tables_; i++)
            max_key = std::max(max_key, ids_[i]);
        key_space_ = max_key + 1;
        miss_pull_.assign(nrank_, 0);
        miss_push_.assign(nrank_, 0);
        update_pull_.assign(nrank_, 0);
        update_push_.assign(nrank_, 0);

        // table scoring order: caller-provided, else profiled by ID reuse
        if (table_order) {
            order_.assign(table_order, table_order + num_tables_);
        } else {
            profile_tables();
        }
        order_.resize(top_k_);
    }

    // Blocks for the next batch. Returns false on end-of-stream.
    bool pop(BatchPlan &out) override {
        std::unique_lock<std::mutex> lk(mut_);
        cv_pop_.wait(lk, [this] {
            return !queue_.empty() || done_ || close_.load();
        });
        if (queue_.empty()) return false;
        out = std::move(queue_.front());
        queue_.pop_front();
        cv_push_.notify_one();
        return true;
    }

    size_t queue_length() override {
        std::lock_guard<std::mutex> lk(mut_);
        return queue_.size();
    }

    void perf(long out[4]) const override {
        auto avg = [&](const std::vector<long> &v) {
            long s = 0;
            for (auto &x : v)
                s += __atomic_load_n(&x, __ATOMIC_RELAXED);
            return s / nrank_;
        };
        out[0] = avg(miss_pull_);
        out[1] = avg(miss_push_);
        out[2] = avg(update_pull_);
        out[3] = avg(update_push_);
    }

    long iter_time_us() const override {
        long c = __atomic_load_n(&iter_cnt_, __ATOMIC_RELAXED);
        if (c == 0) return 0;
        return __atomic_load_n(&iter_sum_, __ATOMIC_RELAXED) / c;
    }

    // cumulative per-phase µs: score / assign / plan / replay
    void phase_times(long out[4]) const override {
        for (int i = 0; i < 4; i++)
            out[i] = __atomic_load_n(&phase_us_[i], __ATOMIC_RELAXED);
    }

protected:
    void profile_tables() {
        // reuse score per table = 1 - unique/count over (a sample of) the
        // epoch; descending reuse = the tables where cache hits pay off
        // (replaces the reference's offline-profiled per-dataset orders).
        order_.resize(num_tables_);
        std::iota(order_.begin(), order_.end(), 0);
        int64_t sample_n = std::min<int64_t>(num_samples_, 200000);
        std::vector<double> reuse(num_tables_, 0.0);
        pool_.parallel_for(num_tables_, [&](int t) {
            std::vector<key_t_> col;
            col.reserve(sample_n);
            for (int64_t i = 0; i < sample_n; i++)
                col.push_back(ids_[i * num_tables_ + t]);
            std::sort(col.begin(), col.end());
            int64_t uniq = std::unique(col.begin(), col.end()) - col.begin();
            reuse[t] = 1.0 - double(uniq) / double(sample_n);
        });
        // stable: ties keep table index order (matches the numpy mirror)
        std::stable_sort(order_.begin(), order_.end(),
                         [&](int a, int b) { return reuse[a] > reuse[b]; });
    }

    const key_t_ *sample(int64_t idx) const {
        return &ids_[(idx % num_samples_) * num_tables_];
    }

    // Push a finished plan, honoring the queue bound. Returns false when
    // the scheduler is closing.
    bool push_plan(BatchPlan &&bp) {
        {
            std::unique_lock<std::mutex> lk(mut_);
            cv_push_.wait(lk, [this] {
                return int(queue_.size()) < queue_cap_ || close_.load();
            });
            if (close_.load()) return false;
            queue_.push_back(std::move(bp));
        }
        cv_pop_.notify_all();
        return true;
    }

    void mark_done() {
        {
            std::lock_guard<std::mutex> lk(mut_);
            done_ = true;
        }
        cv_pop_.notify_all();
    }

    // immutable config (ids_ is borrowed — caller keeps it alive)
    const key_t_ *ids_;
    int64_t num_samples_;
    int num_tables_, nrank_, mbs_;
    int64_t batch_num_;
    int epochs_, top_k_, n_threads_, queue_cap_;
    key_t_ key_space_;
    std::vector<int> order_;

    // planner counters (background thread only)
    std::vector<long> miss_pull_, miss_push_, update_pull_, update_push_;
    mutable long iter_sum_ = 0, iter_cnt_ = 0;
    mutable long phase_us_[4] = {0, 0, 0, 0};

    struct PhaseTimer {
        long &acc;
        std::chrono::steady_clock::time_point t0;
        explicit PhaseTimer(long &a)
            : acc(a), t0(std::chrono::steady_clock::now()) {}
        ~PhaseTimer() {
            acc += std::chrono::duration_cast<std::chrono::microseconds>(
                std::chrono::steady_clock::now() - t0).count();
        }
    };

    Pool pool_;

    // queue
    std::deque<BatchPlan> queue_;
    std::mutex mut_;
    std::condition_variable cv_pop_, cv_push_;
    bool done_ = false;
    std::atomic<bool> close_{false};
};

// MaskT: one word per key; bit z = worker z caches the key (valid).
// uint8_t covers the common nrank<=8; wider nrank widens the word.
template <class MaskT>
class SchedulerT final : public SchedBase {
public:
    using SchedBase::SchedBase;

    ~SchedulerT() override { stop(); }

    void start() override {
        masks_.assign(size_t(key_space_), 0);
        caches_.resize(nrank_);
        for (int z = 0; z < nrank_; z++)
            caches_[z].init(cache_size_, masks_.data(), z);
        worker_ = std::thread([this] { run(); });
    }

    void set_cache_size(int64_t c) { cache_size_ = c; }

    void stop() {
        close_.store(true);
        cv_pop_.notify_all();
        cv_push_.notify_all();
        if (worker_.joinable()) worker_.join();
    }

private:
    void run() {
        int64_t gbs = int64_t(nrank_) * mbs_;
        // one extra batch after the final epoch so the one-batch-lookahead
        // consumer has a plan for its last real batch (reference
        // topk_scheduler.cc:275-277 makes the same allowance)
        int64_t total_batches = batch_num_ * epochs_ + 1;
        std::vector<int> scores(gbs * nrank_);
        for (int64_t b = 0; b < total_batches && !close_.load(); b++) {
            auto t0 = std::chrono::steady_clock::now();
            BatchPlan bp = plan_batch(b * gbs, scores);
            replay(bp);
            auto t1 = std::chrono::steady_clock::now();
            if (b >= 12) {
                __atomic_fetch_add(
                    &iter_sum_,
                    long(std::chrono::duration_cast<std::chrono::
                         microseconds>(t1 - t0).count()),
                    __ATOMIC_RELAXED);
                __atomic_fetch_add(&iter_cnt_, 1L, __ATOMIC_RELAXED);
            }
            if (!push_plan(std::move(bp))) break;
        }
        mark_done();
    }

    BatchPlan plan_batch(int64_t start, std::vector<int> &scores) {
        int64_t gbs = int64_t(nrank_) * mbs_;
        const MaskT *mask = masks_.data();
        // --- score samples against every worker's cache snapshot ---------
        // one probe per (sample, top-K key); the residency word fans out to
        // all workers' scores (reference topk_scheduler.cc:393-427 probes
        // per worker)
        std::fill(scores.begin(), scores.end(), 0);
        auto tick = std::chrono::steady_clock::now();
        auto lap = [&](int phase) {
            auto now = std::chrono::steady_clock::now();
            __atomic_fetch_add(
                &phase_us_[phase],
                long(std::chrono::duration_cast<std::chrono::microseconds>(
                    now - tick).count()),
                __ATOMIC_RELAXED);
            tick = now;
        };
        // one random probe per (sample, table): the residency words are
        // stashed in mwords_ (gbs x T, L2-resident) so the comm-plan pass
        // below never touches the big mask array again
        mwords_.resize(gbs * num_tables_);
        int n_chunks = n_threads_;
        int64_t chunk = (gbs + n_chunks - 1) / n_chunks;
        pool_.parallel_for(n_chunks, [&](int c) {
            int64_t lo = c * chunk, hi = std::min<int64_t>(gbs, lo + chunk);
            for (int64_t i = lo; i < hi; i++) {
                const key_t_ *s = sample(start + i);
                MaskT *mw = &mwords_[i * num_tables_];
                for (int t = 0; t < num_tables_; t++) mw[t] = mask[s[t]];
                int *row = &scores[i * nrank_];
                for (int k = 0; k < top_k_; k++) {
                    MaskT m = mw[order_[k]];
                    while (m) {
                        row[__builtin_ctzll(
                            (unsigned long long)m)]++;
                        m &= MaskT(m - 1);
                    }
                }
            }
        });

        // --- greedy load-balanced assignment ------------------------------
        // process samples in descending best-score order so high-affinity
        // samples win their preferred worker before quotas fill
        lap(0);
        BatchPlan bp;
        bp.assign.assign(gbs, 0);
        bp.plans.resize(nrank_);
        std::vector<int> load(nrank_, 0);
        std::vector<int64_t> order_idx(gbs);
        std::iota(order_idx.begin(), order_idx.end(), 0);
        std::vector<int> best(gbs);
        for (int64_t i = 0; i < gbs; i++)
            best[i] = *std::max_element(&scores[i * nrank_],
                                        &scores[i * nrank_] + nrank_);
        std::stable_sort(order_idx.begin(), order_idx.end(),
                         [&](int64_t a, int64_t b) {
                             return best[a] > best[b];
                         });
        local_of_slot_.resize(gbs);
        for (int64_t oi = 0; oi < gbs; oi++) {
            int64_t i = order_idx[oi];
            const int *row = &scores[i * nrank_];
            int pick = -1, pick_score = -1;
            for (int z = 0; z < nrank_; z++) {
                if (load[z] < mbs_ && row[z] > pick_score) {
                    pick_score = row[z];
                    pick = z;
                }
            }
            int64_t slot = int64_t(pick) * mbs_ + load[pick];
            bp.assign[slot] = (start + i) % num_samples_;
            local_of_slot_[slot] = int32_t(i);
            load[pick]++;
        }

        // --- communication plans ------------------------------------------
        // plan[z] = keys of samples assigned to OTHER workers that are
        // valid in worker z's cache: z must flush them so readers see fresh
        // rows (reference laia_scheduler.cc:252-270 semantics).
        //
        // Pass 1 (parallel over slot chunks): each thread walks its slots
        // reading the STASHED residency words (no random mask probes) and
        // appends keys to per-(thread, reader) buckets. A direct-mapped
        // filter keyed by (key -> readers-already-emitted mask) absorbs the
        // duplicate-heavy zipf head before any sort. Pass 2 (parallel over
        // readers): concatenate the thread buckets, sort, unique.
        lap(1);
        if (int(tl_plans_.size()) != n_chunks) {
            tl_plans_.assign(n_chunks,
                             std::vector<std::vector<key_t_>>(nrank_));
            tl_filts_.assign(n_chunks,
                             std::vector<FiltEnt>(kFiltSize, {-1, 0}));
        }
        pool_.parallel_for(n_chunks, [&](int c) {
            int64_t lo = c * chunk, hi = std::min<int64_t>(gbs, lo + chunk);
            auto &buckets = tl_plans_[c];
            for (auto &b : buckets) b.clear();
            auto &filt = tl_filts_[c];
            std::fill(filt.begin(), filt.end(), FiltEnt{-1, 0});
            for (int64_t slot = lo; slot < hi; slot++) {
                int w = int(slot / mbs_);
                MaskT self = MaskT(1) << w;
                const key_t_ *s = &ids_[bp.assign[slot] * num_tables_];
                const MaskT *mw =
                    &mwords_[int64_t(local_of_slot_[slot]) * num_tables_];
                for (int t = 0; t < num_tables_; t++) {
                    MaskT m = MaskT(mw[t] & ~self);
                    if (!m) continue;
                    key_t_ key = s[t];
                    auto &fe = filt[size_t(key) & (kFiltSize - 1)];
                    if (fe.key == key) {
                        m = MaskT(m & ~fe.done);
                        fe.done = MaskT(fe.done | m);
                    } else {
                        fe = {key, m};
                    }
                    while (m) {
                        buckets[__builtin_ctzll(
                            (unsigned long long)m)].push_back(key);
                        m &= MaskT(m - 1);
                    }
                }
            }
        });
        pool_.parallel_for(nrank_, [&](int z) {
            auto &keys = bp.plans[z];
            size_t total = 0;
            for (int c = 0; c < n_chunks; c++)
                total += tl_plans_[c][z].size();
            keys.reserve(total);
            for (int c = 0; c < n_chunks; c++)
                keys.insert(keys.end(), tl_plans_[c][z].begin(),
                            tl_plans_[c][z].end());
            std::sort(keys.begin(), keys.end());
            keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
        });
        lap(2);
        return bp;
    }

    void replay(const BatchPlan &bp) {
        // mirror real worker-cache evolution (reference laia_scheduler.cc
        // launch loop / topk_scheduler.cc:306-337): outdate flushed keys,
        // then touch this batch's unique keys per assigned worker
        PhaseTimer t(phase_us_[3]);
        pool_.parallel_for(nrank_, [&](int z) {
            for (auto k : bp.plans[z]) caches_[z].outdate(k);
            std::vector<key_t_> keys;
            keys.reserve(mbs_ * num_tables_);
            const key_t_ *base = &bp.assign[int64_t(z) * mbs_];
            for (int j = 0; j < mbs_; j++) {
                const key_t_ *s = &ids_[base[j] * num_tables_];
                keys.insert(keys.end(), s, s + num_tables_);
            }
            std::sort(keys.begin(), keys.end());
            keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
            for (auto k : keys) {
                int res = caches_[z].get(k);
                if (res < 0) {
                    if (res == -2)
                        __atomic_fetch_add(&update_pull_[z], 1,
                                           __ATOMIC_RELAXED);
                } else {
                    __atomic_fetch_add(&miss_pull_[z], 1, __ATOMIC_RELAXED);
                    if (res > 0)
                        __atomic_fetch_add(&miss_push_[z], 1,
                                           __ATOMIC_RELAXED);
                }
            }
            __atomic_fetch_add(&update_push_[z], long(bp.plans[z].size()),
                               __ATOMIC_RELAXED);
        });
    }

    int64_t cache_size_ = 0;
    std::vector<MaskT> masks_;
    std::vector<LruSim<MaskT>> caches_;
    std::thread worker_;

    // plan-phase scratch (background thread only)
    struct FiltEnt { key_t_ key; MaskT done; };
    static constexpr size_t kFiltSize = 1 << 15;
    std::vector<MaskT> mwords_;                 // [gbs, T] residency words
    std::vector<int32_t> local_of_slot_;        // slot -> batch-local sample
    std::vector<std::vector<std::vector<key_t_>>> tl_plans_;
    std::vector<std::vector<FiltEnt>> tl_filts_;
};

ISched *make_scheduler(const key_t_ *ids, int64_t num_samples,
                       int num_tables, int nrank, int mbs,
                       int64_t batch_num, int epochs, int64_t cache_size,
                       int top_k, const int *table_order, int n_threads,
                       int queue_cap) {
    auto build = [&](auto tag) -> ISched * {
        using MaskT = decltype(tag);
        auto *s = new SchedulerT<MaskT>(ids, num_samples, num_tables, nrank,
                                        mbs, batch_num, epochs, top_k,
                                        table_order, n_threads, queue_cap);
        s->set_cache_size(cache_size);
        return s;
    };
    if (nrank <= 8) return build(uint8_t{});
    if (nrank <= 16) return build(uint16_t{});
    if (nrank <= 32) return build(uint32_t{});
    if (nrank <= 64) return build(uint64_t{});
    return nullptr;   // > 64 local workers: widen MaskT before enabling
}

} // namespace herald

// ---------------------------------------------------------------------
// C ABI (ctypes). `ids` is BORROWED for the scheduler's lifetime — the
// Python binding pins the numpy buffer (scheduler.py _ids_keepalive).
// ---------------------------------------------------------------------
struct HSched {
    herald::ISched *sched;
    herald::BatchPlan current;
    bool has_current = false;
};

extern "C" {

void *hsched_create(const int64_t *ids, int64_t num_samples, int num_tables,
                    int nrank, int mbs, int64_t batch_num, int epochs,
                    int64_t cache_size, int top_k, const int *table_order,
                    int n_threads, int queue_cap) {
    auto *h = new HSched();
    h->sched = herald::make_scheduler(ids, num_samples, num_tables, nrank,
                                      mbs, batch_num, epochs, cache_size,
                                      top_k, table_order, n_threads,
                                      queue_cap);
    if (!h->sched) {
        delete h;
        return nullptr;
    }
    return h;
}

void hsched_start(void *h) { static_cast<HSched *>(h)->sched->start(); }

// Phase 1: block for next batch; fill assignment [nrank*mbs] and per-worker
// plan sizes [nrank]. Returns total plan length, or -1 on end-of-stream.
int64_t hsched_pop_begin(void *h, int64_t *assign_out,
                         int64_t *plan_sizes_out) {
    auto *s = static_cast<HSched *>(h);
    if (!s->sched->pop(s->current)) return -1;
    s->has_current = true;
    std::memcpy(assign_out, s->current.assign.data(),
                s->current.assign.size() * sizeof(int64_t));
    int64_t total = 0;
    for (size_t z = 0; z < s->current.plans.size(); z++) {
        plan_sizes_out[z] = int64_t(s->current.plans[z].size());
        total += plan_sizes_out[z];
    }
    return total;
}

// Phase 2: copy the concatenated plans into plan_out (size from phase 1).
void hsched_pop_finish(void *h, int64_t *plan_out) {
    auto *s = static_cast<HSched *>(h);
    int64_t off = 0;
    for (auto &p : s->current.plans) {
        std::memcpy(plan_out + off, p.data(), p.size() * sizeof(int64_t));
        off += int64_t(p.size());
    }
    s->has_current = false;
}

int64_t hsched_queue_length(void *h) {
    return int64_t(static_cast<HSched *>(h)->sched->queue_length());
}

void hsched_perf(void *h, long *out4) {
    static_cast<HSched *>(h)->sched->perf(out4);
}

long hsched_iter_time_us(void *h) {
    return static_cast<HSched *>(h)->sched->iter_time_us();
}

// cumulative per-phase planning µs: [score, assign, plan, replay]
void hsched_phase_times(void *h, long *out4) {
    static_cast<HSched *>(h)->sched->phase_times(out4);
}

void hsched_destroy(void *h) {
    auto *s = static_cast<HSched *>(h);
    delete s->sched;
    delete s;
}

// ---------------------------------------------------------------------
// Standalone LruSim handle: the cache simulator alone, for exact
// counter-parity harnesses that replay one op stream through this sim
// AND the reference's header-only MiniLRUCache
// (laia/include/mini_lru_cache.h) and assert identical return codes
// (tests/test_golden_sim_parity.py). Same -1/-2/0/1 get contract the
// scheduler uses internally.
// ---------------------------------------------------------------------
struct HSim {
    std::vector<uint64_t> masks;
    herald::LruSim<uint64_t> sim;
};

void *hsim_create(int64_t capacity, int64_t key_space) {
    auto *s = new HSim;
    s->masks.assign(size_t(key_space), 0);
    s->sim.init(size_t(capacity), s->masks.data(), 0);
    return s;
}

int hsim_get(void *h, int64_t key) {
    return static_cast<HSim *>(h)->sim.get(key);
}

void hsim_outdate(void *h, int64_t key) {
    static_cast<HSim *>(h)->sim.outdate(key);
}

int hsim_check(void *h, int64_t key) {
    return static_cast<HSim *>(h)->sim.check(key) ? 1 : 0;
}

// fill `out` (caller-sized via a first call with out=null) with the
// sorted currently-valid keys; returns the count
int64_t hsim_valid_keys(void *h, int64_t *out) {
    auto keys = static_cast<HSim *>(h)->sim.valid_keys();
    if (out)
        std::memcpy(out, keys.data(), keys.size() * sizeof(int64_t));
    return int64_t(keys.size());
}

void hsim_destroy(void *h) { delete static_cast<HSim *>(h); }

} // extern "C"

// ABI guard: build.py compiles each library with -DHERALD_ABI_HASH=<hash
// of its sources> and verifies this symbol at load, so a stale .so next
// to edited sources fails loudly instead of corrupting memory through a
// changed struct layout or function signature (ctypes has no linker to
// catch it).
#ifndef HERALD_ABI_HASH
#define HERALD_ABI_HASH 0L
#endif
extern "C" long herald_abi_hash() { return HERALD_ABI_HASH; }
