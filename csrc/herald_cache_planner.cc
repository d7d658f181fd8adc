// herald_cache_planner — integrated lookahead scheduler + cache manager.
//
// TPU-native merge of the reference's two host-side components:
//  * the Laia scheduler's per-worker cache *simulation*
//    (laia/src/laia_scheduler.cc, laia/include/mini_lru_cache.h), and
//  * the worker-side embedding cache's *bookkeeping*
//    (src/hetu_cache/src/cache.cc: lookup dedup, version staleness,
//    planned push via embeddingUpdateWithPushKeys, eviction flush).
//
// On TPU the cached row *values* live in a device array; the host only
// tracks membership/slots/dirtiness. Since the planner already simulates
// exactly that state machine one batch ahead, it can emit a complete
// static-shape "micro-program" per worker per step that the device
// executes verbatim:
//
//   assign [mbs]          which samples this worker trains
//   slots  [U_cap]        cache slot of each sorted-unique batch key
//   uniq   [U_cap]        the sorted-unique batch keys themselves (-1 pad)
//   inv    [mbs*T]        position -> index into uniq (jnp.unique inverse;
//                         host-side dedup — the device step consumes
//                         uniq/inv instead of re-running a sort-based
//                         jnp.unique the planner already paid for)
//   pull   [U_cap] mask   keys that must be fetched from the owner shard
//                         (miss or stale) before the forward pass
//   flush_ids/slots [F_cap] dirty rows to push to their owner *this* step:
//                         rows other workers' CURRENT batch reads (the
//                         comm plan — planning phase 5 upgrades those
//                         readers' entries to pulls, so the flush lands
//                         before the read it was planned for, the moral
//                         equivalent of the reference's one-batch
//                         lookahead, laia_dataloader.py:107-114), evicted
//                         dirty rows, and stale-dirty rows being refreshed
//
// Device-step contract (engine): phase 1 all flushes are applied to the
// owner table, phase 2 all pulls gather from the updated table. Staleness
// from step-t flushes therefore becomes visible to reads at steps > t,
// except a worker's own flush+refresh in the same step (self-consistent).
//
// The planner enforces the static capacities itself: flushes beyond F_cap
// or beyond the per-owner-shard routing capacity are deferred (stay dirty)
// rather than dropped, so the device never overflows on the push path.
//
// Performance design (planning must keep pace with ~ms TPU steps; the
// reference's answer was top-K filtering + shm fan-out, ours is):
//  * per-key worker state lives in ONE interleaved word: bit z = worker z
//    caches the key, bit HALF+z = that copy is dirty. Scoring costs one
//    random probe per (sample, key) and stashes the word, so the
//    planned-flush pass over other workers' samples re-reads the stashed
//    words sequentially instead of probing hash maps (~nrank x fewer
//    random accesses, which dominate at Criteo key-space sizes);
//  * SlotCache uses a pre-allocated entry pool + open-addressing hash with
//    backward-shift deletion — no allocation or malloc contention in
//    steady state;
//  * per-worker transactions run on a persistent thread pool; the only
//    shared writes are each worker's own bits in the state words (atomic
//    RMW), so the parallel schedule is deterministic.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC herald_cache_planner.cc -o libherald_planner.so -lpthread

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <climits>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <deque>
#include <unordered_map>
#include <unordered_set>
#include <mutex>
#include <numeric>
#include <thread>
#include <vector>
#include <chrono>

#include "herald_common.h"

namespace herald {

// ---------------------------------------------------------------------
// Slot-tracking cache state machine (host mirror of the device-side
// cache array). Replaces both MiniLRUCache (simulation) and the reference
// LRUCache/Embedding-Line bookkeeping (slots + dirty + stale).
// ---------------------------------------------------------------------
// Cache replacement policies, matching the reference cache family:
//   LRU    <- src/hetu_cache/include/lru_cache.h
//   LFU    <- src/hetu_cache/src/lfu_cache.cc (frequency lists, O(1))
//   LFUOPT <- src/hetu_cache/include/lfuopt_cache.h (capped counter
//             kUseCntMax=10; rows at the cap graduate to a permanent
//             store exempt from eviction)
enum class Policy : int { LRU = 0, LFU = 1, LFUOPT = 2 };

class SlotCache {
public:
    struct Entry {
        int slot;
        bool dirty;   // has unflushed local gradient delta
        int stale;    // remote flushes since our last pull (HET version
                      // gap: pull when stale > bound, PSFhandle_embedding
                      // .cc:30-64 server_ver - client_ver > bound)
        int freq;     // frequency bucket (always 0 under LRU)
        int lru_prev, lru_next;   // intrusive list within the freq bucket
        key_t_ key;
        bool used;
        int32_t dirty_batch = -1;   // batch seq of the oldest unflushed
                                    // delta (-1 = clean): planned flushes
                                    // emit oldest-first under the owner
                                    // budget so no candidate starves
    };

    void init(int capacity, Policy policy = Policy::LRU) {
        cap_ = capacity;
        policy_ = policy;
        // LFUOPT: reference kUseCntMax = 10 (lfuopt_cache.h:19). LFU
        // keeps EXACT unbounded counts via the sparse bucket pool below
        // (the reference LFUCache's 2-D frequency list,
        // src/hetu_cache/src/lfu_cache.cc:43-71); freq_cap_ only gates
        // the array-bucket policies.
        freq_cap_ = policy == Policy::LFUOPT ? 10 : 0;
        entries_.assign(capacity,
                        Entry{0, false, 0, 0, -1, -1, -1, false});
        for (int s = 0; s < capacity; s++) {
            entries_[s].slot = s;
            free_.push_back(capacity - 1 - s);   // allocate slot 0 first
        }
        size_t want = 16;
        while (want < 2 * size_t(capacity + 2)) want <<= 1;
        hslots_.assign(want, -1);
        hmask_ = want - 1;
        heads_.assign(freq_cap_ + 1, -1);
        tails_.assign(freq_cap_ + 1, -1);
        fpool_.clear();
        ffree_.clear();
        fb_low_ = -1;
    }

    Entry *find(key_t_ key) {
        int32_t n = hslots_[probe(key)];
        return n < 0 ? nullptr : &entries_[n];
    }

    Entry *entry_at(int slot) { return &entries_[slot]; }

    // two-stage software prefetch for the per-key transaction loop: the
    // table spans ~40 MB of hash slots + ~130 MB of entries at reference
    // scale, so every find() is a DRAM round trip; issuing the hash-line
    // fetch ~16 keys ahead and the entry fetch ~4 keys ahead overlaps
    // those latencies with useful work
    void prefetch_hash(key_t_ key) const {
        __builtin_prefetch(&hslots_[hash64(uint64_t(key)) & hmask_]);
    }
    void prefetch_entry(key_t_ key) const {
        int32_t n = hslots_[hash64(uint64_t(key)) & hmask_];
        if (n >= 0) __builtin_prefetch(&entries_[n]);
    }

    // Insert `key`; returns the slot. If eviction was needed, *evicted is
    // filled with the victim entry (pre-overwrite copy).
    int insert(key_t_ key, bool *had_evict, Entry *evicted) {
        int slot;
        if (!free_.empty()) {
            slot = free_.back();
            free_.pop_back();
            *had_evict = false;
        } else {
            slot = victim();
            *evicted = entries_[slot];
            *had_evict = true;
            detach(slot);
            erase_hslot(probe(entries_[slot].key));
        }
        Entry &e = entries_[slot];
        e.key = key;
        e.dirty = false;
        e.dirty_batch = -1;
        e.stale = 0;
        e.freq = 0;
        e.used = true;
        if (policy_ == Policy::LFU) {
            // reference _create (lfu_cache.cc:43-48): join the use=1
            // bucket, creating it as the new lowest if absent
            if (fb_low_ < 0 || fpool_[fb_low_].use > 1)
                fb_insert_after(fb_alloc(1), -1);
            fb_push_front(fb_low_, slot);
        } else {
            attach_front(slot);
        }
        hslots_[probe(key)] = int32_t(slot);
        return slot;
    }

    void touch(int slot) {
        Entry &e = entries_[slot];
        if (policy_ == Policy::LFU) {
            // reference _increase (lfu_cache.cc:52-71): move to the
            // use+1 bucket, creating it in place if absent; drop the
            // old bucket when it empties. Exact unbounded counts.
            int b = e.freq;
            long use = fpool_[b].use;
            int nb = fpool_[b].next;
            fb_detach(b, slot);
            if (nb >= 0 && fpool_[nb].use == use + 1) {
                fb_push_front(nb, slot);
            } else {
                int t = fb_alloc(use + 1);
                fb_insert_after(t, b);
                fb_push_front(t, slot);
            }
            if (fpool_[b].head < 0) fb_remove(b);
            return;
        }
        detach(slot);
        if (policy_ != Policy::LRU && e.freq < freq_cap_) e.freq++;
        attach_front(slot);
    }

    // iterate all resident entries (entry reuse keeps `used` accurate:
    // a used entry always holds the currently-resident key of its slot)
    template <class F>
    void for_each(F &&f) {
        for (auto &e : entries_)
            if (e.used) f(e);
    }

private:
    // hash slot holding `key`, or the empty slot where it would go
    size_t probe(key_t_ key) const {
        size_t h = hash64(uint64_t(key)) & hmask_;
        while (hslots_[h] != -1 && entries_[hslots_[h]].key != key)
            h = (h + 1) & hmask_;
        return h;
    }

    // backward-shift deletion keeps linear probing tombstone-free
    void erase_hslot(size_t i) {
        size_t j = i;
        for (;;) {
            j = (j + 1) & hmask_;
            if (hslots_[j] == -1) break;
            size_t k = hash64(uint64_t(entries_[hslots_[j]].key)) & hmask_;
            if (((j - k) & hmask_) >= ((j - i) & hmask_)) {
                hslots_[i] = hslots_[j];
                i = j;
            }
        }
        hslots_[i] = -1;
    }

    int victim() const {
        if (policy_ == Policy::LFU)
            return fpool_[fb_low_].tail;   // lowest use, LRU within it
        // lowest non-empty frequency bucket, LRU within it. Under LFUOPT
        // the top (permanent) bucket is exempt unless it is all there is.
        int top = policy_ == Policy::LFUOPT ? freq_cap_ - 1 : freq_cap_;
        for (int f = 0; f <= top; f++)
            if (tails_[f] >= 0) return tails_[f];
        return tails_[freq_cap_];    // last resort: LRU among permanents
    }

    void detach(int s) {
        Entry &e = entries_[s];
        if (policy_ == Policy::LFU) {
            int b = e.freq;
            fb_detach(b, s);
            if (fpool_[b].head < 0) fb_remove(b);
            return;
        }
        int f = e.freq;
        if (e.lru_prev >= 0) entries_[e.lru_prev].lru_next = e.lru_next;
        else heads_[f] = e.lru_next;
        if (e.lru_next >= 0) entries_[e.lru_next].lru_prev = e.lru_prev;
        else tails_[f] = e.lru_prev;
        e.lru_prev = e.lru_next = -1;
    }

    // ---- exact-LFU bucket pool: occupied use-counts form an intrusive
    // list of buckets ordered by use, each an LRU list of slots (the
    // reference LFUCache's list<CountList>, lfu_cache.h:20-31) — index-
    // based so steady state allocates nothing. For LFU entries, e.freq
    // holds the entry's BUCKET index; the bucket holds the use count.
    int fb_alloc(long use) {
        int b;
        if (!ffree_.empty()) {
            b = ffree_.back();
            ffree_.pop_back();
        } else {
            b = int(fpool_.size());
            fpool_.push_back(FBucket{});
        }
        fpool_[b] = FBucket{use, -1, -1, -1, -1};
        return b;
    }
    void fb_insert_after(int b, int prev) {   // prev -1 => new lowest
        FBucket &B = fpool_[b];
        B.prev = prev;
        B.next = prev < 0 ? fb_low_ : fpool_[prev].next;
        if (B.next >= 0) fpool_[B.next].prev = b;
        if (prev < 0) fb_low_ = b;
        else fpool_[prev].next = b;
    }
    void fb_remove(int b) {
        FBucket &B = fpool_[b];
        if (B.prev >= 0) fpool_[B.prev].next = B.next;
        else fb_low_ = B.next;
        if (B.next >= 0) fpool_[B.next].prev = B.prev;
        ffree_.push_back(b);
    }
    void fb_push_front(int b, int s) {
        FBucket &B = fpool_[b];
        Entry &e = entries_[s];
        e.freq = b;
        e.lru_prev = -1;
        e.lru_next = B.head;
        if (B.head >= 0) entries_[B.head].lru_prev = s;
        else B.tail = s;
        B.head = s;
    }
    void fb_detach(int b, int s) {
        FBucket &B = fpool_[b];
        Entry &e = entries_[s];
        if (e.lru_prev >= 0) entries_[e.lru_prev].lru_next = e.lru_next;
        else B.head = e.lru_next;
        if (e.lru_next >= 0) entries_[e.lru_next].lru_prev = e.lru_prev;
        else B.tail = e.lru_prev;
        e.lru_prev = e.lru_next = -1;
    }
    void attach_front(int s) {
        Entry &e = entries_[s];
        int f = e.freq;
        e.lru_prev = -1;
        e.lru_next = heads_[f];
        if (heads_[f] >= 0) entries_[heads_[f]].lru_prev = s;
        heads_[f] = s;
        if (tails_[f] < 0) tails_[f] = s;
    }

    struct FBucket { long use; int head; int tail; int prev; int next; };

    int cap_ = 0;
    Policy policy_ = Policy::LRU;
    int freq_cap_ = 0;
    std::vector<Entry> entries_;
    std::vector<int> free_;
    std::vector<int32_t> hslots_;
    size_t hmask_ = 0;
    std::vector<int> heads_, tails_;
    std::vector<FBucket> fpool_;   // exact-LFU buckets
    std::vector<int> ffree_;
    int fb_low_ = -1;
};

// LSD radix sort for program keys (non-negative): byte-passes with
// counting, enough passes to cover `maxv` (callers pass the largest
// possible value — the batch-read sort packs (key << pos_bits) | pos,
// which reaches 31 + pos_bits bits at full id range, NOT 32; a fixed
// 4-pass sort silently left bits >= 32 unsorted, interleaving keys that
// share their low 32-pos_bits bits and corrupting the dedup walk's
// uniq/inv at reference-scale tables). The per-batch key sort is on
// the single-chip critical path (plan_batch phase 3) and std::sort's
// branchy comparisons lose to counting passes at the ~10^4-element sizes
// batches produce. Skipped passes (all keys share a byte) cost one
// counting scan only.
static void radix_sort_keys(std::vector<key_t_> &v,
                            std::vector<key_t_> &tmp, key_t_ maxv,
                            int shift = 0) {
    size_t n = v.size();
    if (n < 64) {            // tiny batches: std::sort wins
        std::sort(v.begin(), v.end());
        return;
    }
    // `shift` skips sorting the low bits entirely: the batch-read sort
    // packs (key << pos_bits) | pos and only needs keys grouped/ordered
    // — LSD passes are stable, so positions keep their original order
    // inside a key group and the dedup walk + inv map are unchanged,
    // while the pass count follows the KEY range (e.g. 25-bit criteo
    // ids = 4 passes) instead of the packed width (38 bits = 5).
    maxv >>= shift;
    int passes = 1;
    while (passes < 8 && (maxv >> (8 * passes)) != 0) passes++;
    tmp.resize(n);
    key_t_ *a = v.data(), *b = tmp.data();
    // ONE read pass builds every level's histogram (the data is read
    // `passes`+1 times total instead of 2x `passes`)
    uint32_t cnt[8][256];
    std::memset(cnt, 0, size_t(passes) * sizeof cnt[0]);
    for (size_t i = 0; i < n; i++) {
        key_t_ x = a[i] >> shift;
        for (int p = 0; p < passes; p++) cnt[p][(x >> (p * 8)) & 255]++;
    }
    for (int pass = 0; pass < passes; pass++) {
        uint32_t *c = cnt[pass];
        int sh = shift + pass * 8;
        if (c[(a[0] >> sh) & 255] == n) continue;   // single bucket
        uint32_t sum = 0;
        for (int j = 0; j < 256; j++) {
            uint32_t c2 = c[j];
            c[j] = sum;
            sum += c2;
        }
        for (size_t i = 0; i < n; i++) b[c[(a[i] >> sh) & 255]++] = a[i];
        std::swap(a, b);
    }
    if (a != v.data()) std::memcpy(v.data(), a, n * sizeof(key_t_));
}

// ---------------------------------------------------------------------
struct MicroProgram {
    // per batch, all workers concatenated
    std::vector<key_t_> assign;                 // [nrank * mbs]
    // per worker:
    std::vector<std::vector<int32_t>> slots;    // [u] slot of sorted uniq key
    std::vector<std::vector<uint8_t>> pulls;    // [u] 1 = pull from owner
    std::vector<std::vector<key_t_>> flush_ids; // [f]
    std::vector<std::vector<int32_t>> flush_slots;
    // pulls HOISTED here from later batches (pull smoothing): rows to
    // fetch and insert this step that some later batch in the lookahead
    // window reads — fills underfull all-to-all buckets so the static
    // pull capacity can sit near the MEAN bucket size instead of the max
    std::vector<std::vector<key_t_>> prefetch_ids;   // [p]
    std::vector<std::vector<int32_t>> prefetch_slots;
    // host-side dedup (planner-computed jnp.unique replacement): the
    // sorted unique batch keys themselves plus the position->unique-index
    // inverse map. The device step previously re-derived both with a
    // sort-based jnp.unique (~145 us/step at wdl bench shape inside the
    // scan) even though slots/pulls were ALREADY emitted in this exact
    // order — the lookahead planner pays the dedup once, off the
    // device's critical path (the Herald thesis applied to dedup).
    std::vector<std::vector<key_t_>> uniq_keys;      // [u] sorted uniques
    std::vector<std::vector<int32_t>> inv;           // [mbs*T] pos->uniq idx
};

// per-worker hoistable-pull metadata for the window manager
struct HoistInfo {
    std::vector<key_t_> keys;
    std::vector<int32_t> slots;
    std::vector<int32_t> qidx;     // index into mp.pulls[z]
};

struct IPlanner {
    virtual ~IPlanner() = default;
    virtual void start() = 0;
    virtual bool pop(MicroProgram &out) = 0;
    virtual size_t queue_length() = 0;
    virtual void perf(long out[6]) const = 0;
    virtual long iter_time_us() const = 0;
    virtual void phase_times(long out[4]) const = 0;
    virtual bool finished() = 0;
    virtual void dirty_dump(int worker, std::vector<key_t_> &ids,
                            std::vector<int32_t> &slots) = 0;
};

// MaskT holds both halves of a key's per-worker state: bit z = cached by
// worker z, bit HALF+z = that cached copy is dirty. nrank <= HALF.
// Instantiated up to unsigned __int128 (64 workers); beyond that the
// per-host BroadcastPlanner fan-out shards planning, which is also the
// reference's answer at scale (laia/src/topk_scheduler.cc:71-88).

// ctz over any mask width (128-bit masks split into two 64-bit words)
template <class T>
static inline int ctz_mask(T m) {
    if constexpr (sizeof(T) > 8) {
        unsigned long long lo = (unsigned long long)m;
        if (lo) return __builtin_ctzll(lo);
        return 64 + __builtin_ctzll((unsigned long long)(m >> 64));
    } else {
        return __builtin_ctzll((unsigned long long)m);
    }
}

template <class MaskT>
class CachePlannerT final : public IPlanner {
    static constexpr int HALF = int(sizeof(MaskT)) * 4;

public:
    CachePlannerT(const key_t_ *ids, int64_t num_samples, int num_tables,
                  int nrank, int mbs, int64_t batch_num, int epochs,
                  int64_t cache_rows, int flush_cap, int owner_cap,
                  int num_shards, int64_t rows_per_shard, int top_k,
                  const int *table_order, int n_threads, int queue_cap,
                  int policy = 0, int assign_mode = 0, int64_t pinned = 0,
                  int bound = 0, int pull_target = 0, int hoist_window = 0,
                  int prefetch_cap = 0, int64_t shuffle_seed = 0)
        : ids_(ids), num_samples_(num_samples), num_tables_(num_tables),
          nrank_(nrank), mbs_(mbs), batch_num_(batch_num), epochs_(epochs),
          flush_cap_(flush_cap), owner_cap_(owner_cap),
          num_shards_(num_shards), rows_per_shard_(rows_per_shard),
          top_k_(top_k > 0 ? std::min<int>(top_k, num_tables) : num_tables),
          n_threads_(std::max(1, n_threads)), queue_cap_(queue_cap),
          assign_mode_(assign_mode), pinned_(pinned),
          cache_rows_(cache_rows), bound_(bound),
          pull_target_(pull_target), hoist_window_(hoist_window),
          prefetch_cap_(prefetch_cap), shuffle_seed_(shuffle_seed),
          pool_(std::max(1, n_threads)) {
        key_t_ max_key = 0;
        for (int64_t i = 0; i < num_samples_ * num_tables_; i++)
            max_key = std::max(max_key, ids_[i]);
        key_space_ = max_key + 1;
        // every key must have a valid owner shard: keys outside the padded
        // table would index owner bookkeeping out of bounds
        if (max_key >= int64_t(num_shards_) * rows_per_shard_)
            throw std::invalid_argument(
                "CachePlanner: id " + std::to_string(max_key)
                + " exceeds table rows "
                + std::to_string(int64_t(num_shards_) * rows_per_shard_));
        // program ids travel as int32 through pop_padded; larger keys
        // would silently wrap (the engine asserts the same bound, but
        // the planner is also a standalone probe/sizing API)
        if (max_key >= int64_t(INT32_MAX))
            throw std::invalid_argument(
                "CachePlanner: id " + std::to_string(max_key)
                + " exceeds int32 program-id range");
        // position packing for the batch-read sort (host-side dedup):
        // (key << pos_bits) | pos must fit a signed 64-bit key_t_
        while ((int64_t(1) << pos_bits_) < int64_t(mbs_) * num_tables_)
            pos_bits_++;
        if (31 + pos_bits_ > 62)
            throw std::invalid_argument(
                "CachePlanner: batch_size * num_tables too large to "
                "pack positions next to 31-bit keys");
        caches_.resize(nrank_);
        for (auto &c : caches_)
            c.init(int(cache_rows), static_cast<Policy>(policy));
        state_.assign(size_t(key_space_), 0);
        miss_pull_.assign(nrank_, 0);
        miss_push_.assign(nrank_, 0);
        update_pull_.assign(nrank_, 0);
        update_push_.assign(nrank_, 0);
        deferred_flush_.assign(nrank_, 0);
        hoisted_.assign(nrank_, 0);

        if (table_order) {
            order_.assign(table_order, table_order + num_tables_);
        } else {
            profile_tables();
        }
        order_.resize(top_k_);
    }

    ~CachePlannerT() override { stop(); }

    void start() override { worker_ = std::thread([this] { run(); }); }

    void stop() {
        close_.store(true);
        cv_pop_.notify_all();
        cv_push_.notify_all();
        if (worker_.joinable()) worker_.join();
    }

    bool pop(MicroProgram &out) override {
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

    void perf(long out[6]) const override {
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
        out[4] = avg(deferred_flush_);
        // hoisted is a global count (sums are small; an average would
        // integer-divide early hoists to zero)
        long hs = 0;
        for (auto &x : hoisted_)
            hs += __atomic_load_n(&x, __ATOMIC_RELAXED);
        out[5] = hs;
    }

    long iter_time_us() const override {
        long c = __atomic_load_n(&iter_cnt_, __ATOMIC_RELAXED);
        if (c == 0) return 0;
        return __atomic_load_n(&iter_sum_, __ATOMIC_RELAXED) / c;
    }

    // cumulative per-phase planning µs: score / assign / plan / stale
    void phase_times(long out[4]) const override {
        for (int i = 0; i < 4; i++)
            out[i] = __atomic_load_n(&phase_us_[i], __ATOMIC_RELAXED);
    }

    // Final sync: list every dirty row (id, slot) per worker so the engine
    // can flush residual deltas before eval/checkpoint. Only call after the
    // planning thread finished (end of epochs).
    bool finished() override {
        std::lock_guard<std::mutex> lk(mut_);
        return done_;
    }

    void dirty_dump(int worker, std::vector<key_t_> &ids,
                    std::vector<int32_t> &slots) override {
        caches_[worker].for_each([&](SlotCache::Entry &e) {
            if (e.dirty) {
                ids.push_back(e.key);
                slots.push_back(e.slot);
            }
        });
    }

private:
    static constexpr MaskT cbit(int z) { return MaskT(MaskT(1) << z); }
    static constexpr MaskT dbit(int z) {
        return MaskT(MaskT(1) << (HALF + z));
    }
    static constexpr MaskT low_half() {
        return MaskT((MaskT(1) << HALF) - 1);
    }

    void set_bits(key_t_ k, MaskT bits) {
        __atomic_fetch_or(&state_[k], bits, __ATOMIC_RELAXED);
    }
    void clear_bits(key_t_ k, MaskT bits) {
        __atomic_fetch_and(&state_[k], MaskT(~bits), __ATOMIC_RELAXED);
    }

    void profile_tables() {
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
        std::stable_sort(order_.begin(), order_.end(),
                         [&](int a, int b) { return reuse[a] > reuse[b]; });
    }

    // stream position -> sample row, through the per-epoch shuffle when
    // enabled (shuffle_seed != 0): the reference's Laia path trains a
    // fixed epoch matrix; reshuffling every epoch is standard practice
    // and stays deterministic (seed ^ epoch Fisher-Yates), so resume
    // replays identically.
    int64_t sample_index(int64_t idx) const {
        int64_t p = idx % num_samples_;
        return shuffle_seed_ ? perm_[p] : p;
    }
    const key_t_ *sample(int64_t idx) const {
        return &ids_[sample_index(idx) * num_tables_];
    }

    static uint64_t splitmix64(uint64_t x) {
        x += 0x9E3779B97F4A7C15ull;
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
        x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
        return x ^ (x >> 31);
    }

    void regen_perm(int64_t epoch) {
        if (perm_.empty()) {
            perm_.resize(num_samples_);
        }
        std::iota(perm_.begin(), perm_.end(), int64_t(0));
        uint64_t st = splitmix64(uint64_t(shuffle_seed_)
                                 ^ (uint64_t(epoch) * 0xD1B54A32D192ED03ull));
        for (int64_t i = num_samples_ - 1; i > 0; i--) {
            st = splitmix64(st);
            int64_t j = int64_t(st % uint64_t(i + 1));
            std::swap(perm_[i], perm_[j]);
        }
        perm_epoch_ = epoch;
    }
    int owner_of(key_t_ key) const {
        // strided ownership: shard = key % S (parallel/exchange.py
        // route_ids) — hash-partitioning that spreads hot CTR keys evenly
        // over owners, unlike the reference's contiguous AveragePartitioner
        // (ps-lite/include/ps/partitioner.h:31-123)
        return int(key % num_shards_);
    }

    // window entry for pull smoothing: a planned-but-unqueued program
    // plus its per-(worker, owner) pull-bucket usage and prefetch fill
    struct WindowEntry {
        MicroProgram mp;
        int64_t seq;
        std::vector<std::vector<int>> pull_used;   // [z][owner]
        std::vector<int> prefetch_n;               // per worker
    };

    bool emit_program(MicroProgram &&mp) {
        {
            std::unique_lock<std::mutex> lk(mut_);
            cv_push_.wait(lk, [this] {
                return int(queue_.size()) < queue_cap_ || close_.load();
            });
            if (close_.load()) return false;
            queue_.push_back(std::move(mp));
        }
        cv_pop_.notify_all();
        return true;
    }

    // Move over-target pulls of the just-planned batch `e` into earlier
    // window entries with spare bucket room. Safe by construction: the
    // hoist candidates' values are final from `recent_flush_[key]`
    // onward (cold-miss: never flushed; clean refresh: last flush known),
    // the sim guarantees the cache slot stays untouched until the
    // original batch, and the window manager runs single-threaded on the
    // producer, so everything stays deterministic.
    //
    // LEVELING rule: a pull hoists into the LEAST-FILLED eligible window
    // entry w, and only when that strictly helps the stream max:
    //     w.bucket < max(pull_target_, e.bucket - 1)
    // The first arm is the classic fill-to-target move; the second keeps
    // smoothing when the target is unattainable (a peak taller than the
    // window can absorb at target level) — moving a pull from a bucket
    // of X to one of <= X-2 lowers (or at worst preserves) the stream
    // max, since both end <= X-1 < X. The static capacity is sized by
    // the stream MAX (sizing.py TrafficProfile), so leveling above
    // target still cuts wire width where fill-to-target alone cannot.
    void hoist_into(std::deque<WindowEntry> &window, WindowEntry &e) {
        for (int z = 0; z < nrank_; z++) {
            auto &h = hoist_scratch_[z];
            for (size_t i = 0; i < h.keys.size(); i++) {
                key_t_ key = h.keys[i];
                int ow = owner_of(key);
                if (e.pull_used[z][ow] <= pull_target_) continue;
                auto it = recent_flush_.find(key);
                int64_t lastf = it == recent_flush_.end() ? -1 : it->second;
                // least-filled eligible entry (earliest wins ties —
                // deterministic, and earlier entries leave the window
                // first so their room is the scarcest)
                WindowEntry *best = nullptr;
                int best_used = INT_MAX;
                for (auto &w : window) {
                    if (w.seq < lastf) continue;   // value not final yet
                    if (w.prefetch_n[z] >= prefetch_cap_) continue;
                    int used = w.pull_used[z][ow];
                    if (used < best_used) {
                        best = &w;
                        best_used = used;
                        if (used == 0) break;      // can't do better
                    }
                }
                int lim = std::max(pull_target_, e.pull_used[z][ow] - 1);
                if (!best || best_used >= lim) continue;
                WindowEntry &w = *best;
                w.mp.prefetch_ids[z].push_back(key);
                w.mp.prefetch_slots[z].push_back(h.slots[i]);
                w.pull_used[z][ow]++;
                w.prefetch_n[z]++;
                e.mp.pulls[z][h.qidx[i]] = 0;
                e.pull_used[z][ow]--;
                // perf() reads concurrently with atomic loads
                __atomic_fetch_add(&hoisted_[z], 1L, __ATOMIC_RELAXED);
            }
        }
    }

    void run() {
        int64_t gbs = int64_t(nrank_) * mbs_;
        int64_t total_batches = batch_num_ * epochs_;
        std::vector<int> scores(gbs * nrank_);
        std::deque<WindowEntry> window;
        const bool hw = hoisting_on();
        for (int64_t b = 0; b < total_batches && !close_.load(); b++) {
            if (shuffle_seed_ && b / batch_num_ != perm_epoch_)
                regen_perm(b / batch_num_);
            auto t0 = std::chrono::steady_clock::now();
            MicroProgram mp = plan_batch(b * gbs, scores);
            auto t1 = std::chrono::steady_clock::now();
            if (b >= 12) {
                __atomic_fetch_add(
                    &iter_sum_,
                    long(std::chrono::duration_cast<std::chrono::
                         microseconds>(t1 - t0).count()),
                    __ATOMIC_RELAXED);
                __atomic_fetch_add(&iter_cnt_, 1L, __ATOMIC_RELAXED);
            }
            if (!hw) {
                if (!emit_program(std::move(mp))) break;
                continue;
            }
            // record this batch's flushes FIRST: a pull may not hoist
            // past the flush that finalized its value (including this
            // batch's own flushes — the un-hoisted pull would have seen
            // them applied in phase 1)
            for (int z = 0; z < nrank_; z++)
                for (key_t_ k : mp.flush_ids[z]) recent_flush_[k] = b;
            WindowEntry e{std::move(mp), b,
                          std::move(pull_used_scratch_), {}};
            e.prefetch_n.assign(nrank_, 0);
            hoist_into(window, e);
            window.push_back(std::move(e));
            if (int(window.size()) > hoist_window_) {
                MicroProgram out = std::move(window.front().mp);
                window.pop_front();
                if (!emit_program(std::move(out))) break;
            }
            // bound the flush map: entries older than the window can
            // never block a hoist decision again
            if (int64_t(recent_flush_.size()) > 8 * 1024 * 1024) {
                for (auto it2 = recent_flush_.begin();
                     it2 != recent_flush_.end();)
                    it2 = it2->second < b - hoist_window_
                        ? recent_flush_.erase(it2) : std::next(it2);
            }
        }
        for (auto &w : window)
            if (!emit_program(std::move(w.mp))) break;
        {
            std::lock_guard<std::mutex> lk(mut_);
            done_ = true;
        }
        cv_pop_.notify_all();
    }

    MicroProgram plan_batch(int64_t start, std::vector<int> &scores) {
        int64_t gbs = int64_t(nrank_) * mbs_;
        const int32_t bseq = int32_t(start / gbs);   // dirty-age stamp
        const MaskT *state = state_.data();
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

        // Solo fast path (nrank == 1): scoring, load balancing, the
        // readers/planned-flush machinery, cross-worker staleness and the
        // same-batch upgrade are all no-ops with one worker — every
        // sample lands on worker 0 and no other holder exists to flush
        // to or from. Skipping them (identity assignment in stream
        // order) leaves only the cache transaction itself, which is the
        // single-chip scheduled path's host budget. The batch KEY SET is
        // unchanged, so slots/pulls/flushes are identical to the general
        // path; only the within-batch sample order differs (the general
        // path emits score-sorted order, which with one worker is an
        // arbitrary permutation).
        const bool solo = (nrank_ == 1);

        // ---- 1. affinity scoring (parallel over sample chunks) ----------
        // one random probe per (sample, scored table). Round-robin mode
        // (reference naive_scheduler, python/hetu/laia/laia.pyx:163-189)
        // skips scoring entirely.
        int n_chunks = n_threads_;
        int64_t chunk = (gbs + n_chunks - 1) / n_chunks;
        if (assign_mode_ != 1 && !solo) {
            std::fill(scores.begin(), scores.end(), 0);
            pool_.parallel_for(n_chunks, [&](int c) {
                int64_t lo = c * chunk;
                int64_t hi = std::min<int64_t>(gbs, lo + chunk);
                for (int64_t i = lo; i < hi; i++) {
                    const key_t_ *s = sample(start + i);
                    if (i + 1 < hi) {     // hide the random state_ loads
                        const key_t_ *sn = sample(start + i + 1);
                        for (int k = 0; k < top_k_; k++)
                            __builtin_prefetch(&state[sn[order_[k]]]);
                    }
                    int *row = &scores[i * nrank_];
                    if (top_k_ <= 31) {
                        // carry-save bit-sliced accumulation: per-bit
                        // increments cost O(total set bits) with a
                        // mispredicted inner branch, which blows up
                        // superlinearly at high nrank (dense residency
                        // masks: measured 5.2 -> 30 ms/batch for the
                        // score phase going 32 -> 64 ranks). Adding the
                        // <= 31 masks into five bit PLANES costs a flat
                        // 5 xor/and per mask, then one extraction per
                        // NONZERO worker. Identical counts — the stress
                        // tests pin the planner output bit-exactly.
                        MaskT p0 = 0, p1 = 0, p2 = 0, p3 = 0, p4 = 0;
                        for (int k = 0; k < top_k_; k++) {
                            MaskT carry =
                                MaskT(state[s[order_[k]]] & low_half());
                            MaskT t;
                            t = p0 & carry; p0 ^= carry; carry = t;
                            t = p1 & carry; p1 ^= carry; carry = t;
                            t = p2 & carry; p2 ^= carry; carry = t;
                            t = p3 & carry; p3 ^= carry; carry = t;
                            p4 ^= carry;   // counts <= 31: no overflow
                        }
                        MaskT any = p0 | p1 | p2 | p3 | p4;
                        while (any) {
                            int z = ctz_mask(any);
                            row[z] = int(((p0 >> z) & MaskT(1)) |
                                         (((p1 >> z) & MaskT(1)) << 1) |
                                         (((p2 >> z) & MaskT(1)) << 2) |
                                         (((p3 >> z) & MaskT(1)) << 3) |
                                         (((p4 >> z) & MaskT(1)) << 4));
                            any &= MaskT(any - 1);
                        }
                    } else {
                        for (int k = 0; k < top_k_; k++) {
                            MaskT m =
                                MaskT(state[s[order_[k]]] & low_half());
                            while (m) {
                                row[ctz_mask(m)]++;
                                m &= MaskT(m - 1);
                            }
                        }
                    }
                }
            });
        }
        lap(0);

        // ---- 2. greedy load-balanced assignment --------------------------
        MicroProgram mp;
        mp.assign.assign(gbs, 0);
        mp.slots.resize(nrank_);
        mp.pulls.resize(nrank_);
        mp.flush_ids.resize(nrank_);
        mp.flush_slots.resize(nrank_);
        mp.prefetch_ids.resize(nrank_);
        mp.prefetch_slots.resize(nrank_);
        mp.uniq_keys.resize(nrank_);
        mp.inv.resize(nrank_);
        if (hoisting_on()) {
            hoist_scratch_.assign(nrank_, HoistInfo{});
            pull_used_scratch_.assign(nrank_,
                                      std::vector<int>(num_shards_, 0));
        }
        batch_keys_.resize(nrank_);
        batch_predirty_.resize(nrank_);
        local_of_slot_.resize(gbs);
        worker_of_local_.resize(gbs);
        if (solo) {
            // identity: worker 0 takes the batch in stream order
            for (int64_t i = 0; i < gbs; i++) {
                mp.assign[i] = sample_index(start + i);
                local_of_slot_[i] = int32_t(i);
                worker_of_local_[i] = 0;
            }
        } else if (assign_mode_ == 1) {
            // round-robin: sample i -> worker i % nrank (reference
            // dataloader strided shard, python/hetu/dataloader.py:26)
            for (int64_t i = 0; i < gbs; i++) {
                int w = int(i % nrank_);
                int64_t slot = int64_t(w) * mbs_ + (i / nrank_);
                mp.assign[slot] = sample_index(start + i);
                local_of_slot_[slot] = int32_t(i);
            }
        } else {
            // Quota-partitioned greedy (the reference's thread-parallel
            // assignment, laia/src/topk_scheduler.cc:393-456, made
            // thread-count-independent): the batch is split into V
            // virtual chunks; chunk v holds nrank * quota_v samples and
            // may place at most quota_v of them on each worker, writing
            // each worker's disjoint slot range [qoff_v, qoff_v +
            // quota_v). Chunks are independent — parallel over the pool
            // with no locks — and V depends only on mbs (NOT n_threads),
            // so the result is identical at any thread count (the
            // determinism property the stress tests pin). Within a
            // chunk, samples greedily pick their open argmax in
            // affinity-score order, the same rule the old global greedy
            // applied batch-wide. Affinity quality is insensitive to the
            // chunking (measured: total pulls within 0.1% of the global
            // greedy on the mesh A/B shape, and max-bucket capacities
            // within noise), so V stays a constant.
            constexpr int V = 16;
            int quota[V], qoff[V + 1];
            qoff[0] = 0;
            for (int v = 0; v < V; v++) {
                quota[v] = mbs_ / V + (v < mbs_ % V ? 1 : 0);
                qoff[v + 1] = qoff[v] + quota[v];
            }
            std::vector<int> best_w(gbs);   // argmax worker per sample:
            // the greedy pick takes it O(1) while that worker has quota
            // (identical result to the full scan — argmax over all
            // workers equals argmax over open workers whenever the
            // argmax is open)
            std::vector<int> best(gbs);
            {
                int64_t bchunk = (gbs + n_chunks - 1) / n_chunks;
                pool_.parallel_for(n_chunks, [&](int c) {
                    int64_t lo = c * bchunk;
                    int64_t hi = std::min<int64_t>(gbs, lo + bchunk);
                    for (int64_t i = lo; i < hi; i++) {
                        const int *row = &scores[i * nrank_];
                        int bw = 0;
                        for (int z = 1; z < nrank_; z++)
                            if (row[z] > row[bw]) bw = z;
                        best[i] = row[bw];
                        best_w[i] = bw;
                    }
                });
            }
            pool_.parallel_for(V, [&](int v) {
                int64_t lo = int64_t(nrank_) * qoff[v];
                int64_t hi = int64_t(nrank_) * qoff[v + 1];
                const int cap = quota[v];
                std::vector<int64_t> order_idx(hi - lo);
                std::iota(order_idx.begin(), order_idx.end(), lo);
                std::stable_sort(order_idx.begin(), order_idx.end(),
                                 [&](int64_t a, int64_t b) {
                                     return best[a] > best[b];
                                 });
                std::vector<int> load(nrank_, 0);
                for (int64_t i : order_idx) {
                    int pick = best_w[i];
                    if (load[pick] >= cap) {   // argmax full: open scan
                        const int *row = &scores[i * nrank_];
                        pick = -1;
                        int pick_score = -1;
                        for (int z = 0; z < nrank_; z++) {
                            if (load[z] < cap && row[z] > pick_score) {
                                pick_score = row[z];
                                pick = z;
                            }
                        }
                    }
                    int64_t slot = int64_t(pick) * mbs_ + qoff[v]
                        + load[pick];
                    mp.assign[slot] = sample_index(start + i);
                    local_of_slot_[slot] = int32_t(i);
                    load[pick]++;
                }
            });
        }
        for (int64_t slot = 0; slot < gbs; slot++)
            worker_of_local_[local_of_slot_[slot]] = int(slot / mbs_);

        // ---- 2.5 readers masks + planned-flush candidates ---------------
        // One pass over the batch's (sample, table) ids: readers_[k]
        // accumulates WHICH workers read key k this step; the first
        // toucher also reads k's pre-batch dirty mask and appends k to
        // each dirty holder's candidate list. Candidates are therefore
        // deduped to unique (key, holder) pairs — the planned-flush pass
        // costs O(dirty keys actually read) instead of
        // O(nrank * gbs * tables) (quadratic in workers at scale).
        // Candidate CONTENT is deterministic (exactly one first-toucher
        // wins the atomic OR); ORDER is made deterministic by a per-
        // worker sort in phase 3.
        // solo: no other worker can read this worker's dirty rows, so
        // the candidate/readers machinery has nothing to feed; the
        // cold-miss hoist test below degenerates to !evicted (no other
        // holder exists whose unflushed delta could make the value
        // non-final; eviction-flush recency is checked by recent_flush_
        // in hoist_into, as in the general path)
        if (!solo) {
        if (readers_.empty()) readers_.assign(key_space_, MaskT(0));
        if (int(cand_.size()) != n_chunks) cand_.resize(n_chunks);
        if (int(touched_.size()) != n_chunks) touched_.resize(n_chunks);
        if (int(prezero_.size()) != n_chunks) prezero_.resize(n_chunks);
        pool_.parallel_for(n_chunks, [&](int c) {
            auto &cc = cand_[c];
            if (int(cc.size()) != nrank_) cc.resize(nrank_);
            for (auto &v : cc) v.clear();
            auto &tc = touched_[c];
            tc.clear();
            prezero_[c].clear();
            int64_t lo = c * chunk;
            int64_t hi = std::min<int64_t>(gbs, lo + chunk);
            for (int64_t i = lo; i < hi; i++) {
                const key_t_ *s = sample(start + i);
                if (i + 1 < hi) {     // hide the random readers_ RMWs
                    const key_t_ *sn = sample(start + i + 1);
                    for (int t = 0; t < num_tables_; t++)
                        __builtin_prefetch(&readers_[sn[t]], 1);
                }
                MaskT rb = cbit(worker_of_local_[i]);
                auto &pz = prezero_[c];
                for (int t = 0; t < num_tables_; t++) {
                    key_t_ k = s[t];
                    MaskT prev = __atomic_fetch_or(&readers_[k], rb,
                                                   __ATOMIC_RELAXED);
                    if (prev) continue;          // not the first toucher
                    tc.push_back(k);
                    MaskT w = state[k];
                    if (w == 0) pz.push_back(k);   // nobody caches: a
                    // cold-miss pull of k is hoistable (no one can have
                    // flushed it inside the window)
                    MaskT dm = MaskT(w >> HALF);
                    while (dm) {
                        cc[ctz_mask(dm)].push_back(k);
                        dm &= MaskT(dm - 1);
                    }
                }
            }
        });
        if (hoisting_on()) {
            prezero_set_.clear();
            for (auto &pz : prezero_)
                prezero_set_.insert(pz.begin(), pz.end());
        }
        }   // !solo
        lap(1);

        // ---- 3. per-worker cache transactions (parallel per worker) -----
        // Comm plan for worker z: keys in OTHER workers' batches that are
        // dirty in z's cache -> flush so the owner serves fresh rows.
        // Processing order inside a step: batch transactions FIRST so that
        // mandatory flushes (stale-refresh + eviction) always fit — their
        // count is bounded by the batch's unique keys (each key is either a
        // refresh or at most one eviction) <= flush_cap_. Planned flushes
        // (rows other workers read) then fill the remaining budget and are
        // deferred past it (rows simply stay dirty one step longer).
        //
        // Parallel-safe and deterministic: worker z mutates only its own
        // cache and its own bits of the state words (atomic RMW); the
        // planned pass filters on the PRE-BATCH stashed dirty words and
        // verifies against z's live cache, which reproduces the live
        // dirty test exactly (a stashed dirty bit can only go stale
        // through z's own batch transactions, which the live verify and
        // the own-batch binary_search skip already handle).
        auto plan_worker = [&](int z) {
            SlotCache &c = caches_[z];
            const bool hw = hoisting_on();
            auto note_pull = [&](key_t_ key, int slot, size_t q,
                                 bool hoist_ok) {
                if (!hw) return;
                pull_used_scratch_[z][owner_of(key)]++;
                if (!hoist_ok) return;
                auto &h = hoist_scratch_[z];
                h.keys.push_back(key);
                h.slots.push_back(int32_t(slot));
                h.qidx.push_back(int32_t(q));
            };
            // per-owner routing budget covers ALL flushes of this step —
            // mandatory batch-phase ones included, otherwise a batch whose
            // evictions/refreshes pile onto one owner could exceed the
            // device's per-(src,dst) exchange capacity and silently drop
            // gradient deltas
            std::vector<int> owner_used(num_shards_, 0);
            auto emit_flush = [&](key_t_ key, int slot) {
                owner_used[owner_of(key)]++;
                mp.flush_ids[z].push_back(key);
                mp.flush_slots[z].push_back(slot);
            };

            // --- batch reads: sorted unique keys (device jnp.unique
            // order), with each key's POSITION packed into the sort so
            // the dedup walk also emits the jnp.unique inverse map for
            // free (host-side dedup: the device step no longer runs a
            // sort-based unique — the planner already paid for this
            // sort). Keys are < 2^31 (checked at create), so
            // (key << pos_bits) | pos fits 64 bits; the packed sort
            // costs at most one extra byte-pass over the plain key sort.
            const int pb = pos_bits_;
            const key_t_ pmask = (key_t_(1) << pb) - 1;
            std::vector<key_t_> keys;
            keys.reserve(size_t(mbs_) * num_tables_);
            const key_t_ *base = &mp.assign[int64_t(z) * mbs_];
            for (int j = 0; j < mbs_; j++) {
                const key_t_ *s = &ids_[base[j] * num_tables_];
                const key_t_ p0 = key_t_(j) * num_tables_;
                for (int t = 0; t < num_tables_; t++)
                    keys.push_back((s[t] << pb) | (p0 + t));
            }
            std::vector<key_t_> sort_tmp;
            radix_sort_keys(keys, sort_tmp,
                            ((key_space_ - 1) << pb) | pmask, pb);
            auto &inv = mp.inv[z];
            inv.resize(size_t(mbs_) * num_tables_);
            {
                size_t u = 0;
                key_t_ prev = ~key_t_(0);
                for (size_t i = 0; i < keys.size(); i++) {
                    const key_t_ v = keys[i];   // read BEFORE the in-
                    const key_t_ k = v >> pb;   // place dedup write below
                    if (k != prev) {
                        keys[u++] = k;          // in-place (u <= i)
                        prev = k;
                    }
                    inv[v & pmask] = int32_t(u - 1);
                }
                keys.resize(u);
            }
            batch_keys_[z] = keys;          // phase 5 re-reads them
            mp.uniq_keys[z] = keys;

            auto &slots = mp.slots[z];
            auto &pulls = mp.pulls[z];
            auto &pre_dirty = batch_predirty_[z];
            slots.resize(keys.size());
            pulls.resize(keys.size());
            pre_dirty.assign(keys.size(), 1);
            const size_t nk = keys.size();
            for (size_t q = 0; q < nk; q++) {
                // overlap the DRAM latency of upcoming lookups (hash
                // line ~16 ahead, entry + state word ~4 ahead)
                if (q + 16 < nk) c.prefetch_hash(keys[q + 16]);
                if (q + 4 < nk) {
                    c.prefetch_entry(keys[q + 4]);
                    __builtin_prefetch(&state_[keys[q + 4]]);
                }
                key_t_ key = keys[q];
                SlotCache::Entry *ent;
                if (key < pinned_) {
                    // pinned tier: rows [0, pinned) are replicated dense
                    // parameters updated by psum — no cache slot, no
                    // pull, no flush, no traffic accounting (the device
                    // reads them from its local hot block)
                    slots[q] = int32_t(cache_rows_);   // OOB: device drops
                    pulls[q] = 0;
                    continue;
                }
                auto *e = c.find(key);
                ent = e;
                if (e && e->stale <= bound_) {
                    // fresh, or stale within the allowed version bound
                    // (reference bound>0 semantics: use the cached value)
                    c.touch(e->slot);
                    slots[q] = e->slot;
                    pulls[q] = 0;
                    pre_dirty[q] = e->dirty ? 1 : 0;
                } else if (e) {                    // too stale: refresh
                    bool was_dirty = e->dirty;
                    if (e->dirty) {                // flush-before-refresh
                        emit_flush(e->key, e->slot);
                        e->dirty = false;
                        clear_bits(e->key, dbit(z));
                    }
                    e->stale = 0;
                    c.touch(e->slot);
                    slots[q] = e->slot;
                    pulls[q] = 1;
                    // a CLEAN refresh may hoist: the value became final at
                    // the last flush; the window manager verifies that
                    // flush predates the target batch (recent_flush_)
                    note_pull(key, e->slot, q, !was_dirty);
                    __atomic_fetch_add(&update_pull_[z], 1, __ATOMIC_RELAXED);
                } else {                           // miss: insert
                    bool evicted = false;
                    SlotCache::Entry victim;
                    int slot = c.insert(key, &evicted, &victim);
                    if (evicted) {
                        clear_bits(victim.key, MaskT(cbit(z) | dbit(z)));
                        if (victim.dirty) {
                            // eviction flush: device phase 1 reads the
                            // delta BEFORE phase 3 overwrites the slot
                            emit_flush(victim.key, victim.slot);
                            __atomic_fetch_add(&miss_push_[z], 1, __ATOMIC_RELAXED);
                        }
                    }
                    set_bits(key, cbit(z));
                    slots[q] = slot;
                    pulls[q] = 1;
                    ent = c.entry_at(slot);
                    // a no-eviction cold miss may hoist: the slot was free
                    // since allocation (sim hands it to nobody else) and a
                    // key nobody cached pre-batch cannot have been flushed
                    // (solo: the prezero set degenerates to the miss test
                    // itself — see the phase-2.5 skip above)
                    note_pull(key, slot, q, !evicted
                              && (solo || prezero_set_.count(key) != 0));
                    __atomic_fetch_add(&miss_pull_[z], 1, __ATOMIC_RELAXED);
                }
                // the row receives gradients this step (device phase 5
                // runs after the flush phase, so flushing above and
                // re-dirtying here matches the device exactly). `ent` is
                // the entry for `key` from whichever branch ran — the
                // old re-probe (c.find) here was a second DRAM round
                // trip per key.
                if (!ent->dirty) ent->dirty_batch = bseq;
                ent->dirty = true;
                set_bits(key, dbit(z));
            }

            // --- planned flushes: rows OTHER workers read this batch that
            // are dirty here, within the remaining flush budget. The
            // stashed pre-batch dirty bit is a fast filter; the live cache
            // verifies (covers evictions/flushes from the batch phase).
            long planned = 0;
            if (solo) return;   // no other worker reads these rows: the
            // planned-flush pass has no candidates by construction
            const MaskT dz = dbit(z);
            const MaskT me = cbit(z);
            // candidates are unique keys z held dirty pre-batch that
            // someone reads this step (phase 2.5). Verify against the
            // live cache and the final readers mask, then emit OLDEST
            // DELTA FIRST within the budget (deterministic: age then
            // key). Key-sorted emission let low-numbered keys win the
            // owner budget every batch, starving hot high keys into
            // unbounded staleness when the budget is tight
            // (sched_flush_budget); oldest-first bounds every deferred
            // candidate's age by ~backlog/budget batches.
            std::vector<key_t_> cand;
            for (auto &cc : cand_)
                cand.insert(cand.end(), cc[z].begin(), cc[z].end());
            radix_sort_keys(cand, sort_tmp, key_space_ - 1);
            struct PFlush { int32_t age; key_t_ key; int slot; };
            std::vector<PFlush> elig;
            elig.reserve(cand.size());
            for (key_t_ key : cand) {
                MaskT rm = readers_[key];
                // my own batch keys were already flushed (refresh) or
                // re-dirtied; flushing them again would double-apply
                // their delta on the device
                if (rm & me) continue;
                auto *e = c.find(key);
                if (!e || !e->dirty) continue;
                elig.push_back(PFlush{e->dirty_batch, key, e->slot});
            }
            std::sort(elig.begin(), elig.end(),
                      [](const PFlush &a, const PFlush &b) {
                          return a.age != b.age ? a.age < b.age
                                                : a.key < b.key;
                      });
            for (const PFlush &pf : elig) {
                if (int(mp.flush_ids[z].size()) >= flush_cap_) {
                    __atomic_fetch_add(&deferred_flush_[z], 1,
                                       __ATOMIC_RELAXED);
                    continue;
                }
                int ow = owner_of(pf.key);
                if (owner_used[ow] >= owner_cap_) {
                    __atomic_fetch_add(&deferred_flush_[z], 1,
                                       __ATOMIC_RELAXED);
                    continue;
                }
                // entries_ is slot-indexed and nothing mutates the cache
                // between the verify pass above and here (same thread)
                auto *e = c.entry_at(pf.slot);
                emit_flush(pf.key, pf.slot);   // counts owner_used
                e->dirty = false;
                e->dirty_batch = -1;
                clear_bits(pf.key, dz);
                planned++;
            }
            __atomic_fetch_add(&update_push_[z], planned, __ATOMIC_RELAXED);
        };
        pool_.parallel_for(nrank_, plan_worker);
        lap(2);

        if (solo) {   // phases 4-6 are cross-worker: nothing to do
            lap(3);
            return mp;
        }

        // ---- 4. cross-worker staleness from this step's flushes ---------
        // One pass over the flush lists reads each flushed key's state
        // word ONCE and fans the key out to every holder's candidate
        // list (the old shape had all nrank receivers scan all flushes —
        // nrank redundant state loads per flush); receivers then age
        // their own entries in parallel. A key flushed by two workers is
        // pushed twice to a third holder and still ages it twice; the
        // flusher's own bit is masked out, as before.
        if (int(stale_cand_.size()) != nrank_) stale_cand_.resize(nrank_);
        for (auto &v : stale_cand_) v.clear();
        for (int z = 0; z < nrank_; z++) {
            auto &fl = mp.flush_ids[z];
            const size_t nf = fl.size();
            const MaskT not_me = MaskT(~cbit(z));
            for (size_t x = 0; x < nf; x++) {
                if (x + 8 < nf) __builtin_prefetch(&state[fl[x + 8]]);
                key_t_ key = fl[x];
                MaskT m = MaskT(state[key] & low_half() & not_me);
                while (m) {
                    stale_cand_[ctz_mask(m)].push_back(key);
                    m &= MaskT(m - 1);
                }
            }
        }
        pool_.parallel_for(nrank_, [&](int j) {
            SlotCache &cj = caches_[j];
            auto &v = stale_cand_[j];
            const size_t n = v.size();
            for (size_t x = 0; x < n; x++) {
                if (x + 16 < n) cj.prefetch_hash(v[x + 16]);
                if (x + 4 < n) cj.prefetch_entry(v[x + 4]);
                auto *e = cj.find(v[x]);
                if (e) e->stale++;
            }
        });

        // ---- 5. same-batch refresh upgrade ------------------------------
        // The device applies ALL of this step's flushes before the pulls,
        // so a reader whose row was flushed by another worker THIS batch
        // can pull the fresh value in the same step (this is what the comm
        // plan was computed for). Only entries that were CLEAN before this
        // batch upgrade — a pull overwrites the device's cache value, and
        // a dirty entry's pending local delta must stay visible to its
        // holder until its flush-before-refresh (same rule as the
        // stale-refresh path; reference cache.cc flushes dirty rows before
        // re-pulling them). Dirty or unread rows stay stale and refresh at
        // their next read, as before.
        //
        // Candidate set: after the batch phase every pulls[q]==0 key has
        // stale <= bound_, and phase 4 bumps staleness only for keys in
        // THIS batch's flush lists — so only flushed keys can cross the
        // bound here. Iterating the flush lists (O(flushes x holders),
        // like phase 4) instead of every batch unique per worker
        // (O(nrank x uniques), the old loop) reproduces the exact same
        // upgrades: phase 4 fully precedes this pass, so the first
        // occurrence of a crossed key upgrades it (stale -> 0) and later
        // occurrences see stale <= bound_ and skip, matching the
        // old single-visit check against the final staleness.
        pool_.parallel_for(nrank_, [&](int z) {
            SlotCache &c = caches_[z];
            auto &keys = batch_keys_[z];
            auto &pulls = mp.pulls[z];
            auto &pre_dirty = batch_predirty_[z];
            auto try_upgrade = [&](key_t_ key, size_t q) {
                if (pulls[q] || pre_dirty[q] || key < pinned_) return;
                auto *e = c.find(key);
                if (e && e->stale > bound_) {
                    pulls[q] = 1;
                    e->stale = 0;
                    if (hoisting_on())
                        pull_used_scratch_[z][owner_of(key)]++;
                    __atomic_fetch_add(&update_pull_[z], 1,
                                       __ATOMIC_RELAXED);
                }
            };
            // identical outcomes either way; pick the cheaper scan
            // deterministically from the (deterministic) sizes: few aged
            // entries -> search each (phase-4 candidate = exactly the
            // keys whose staleness moved here this batch) in my sorted
            // batch keys; heavy batches -> one pass over my uniques
            if (stale_cand_[z].size() < keys.size() / 4) {
                for (key_t_ key : stale_cand_[z]) {
                    auto it = std::lower_bound(keys.begin(),
                                               keys.end(), key);
                    if (it == keys.end() || *it != key) continue;
                    try_upgrade(key, size_t(it - keys.begin()));
                }
            } else {
                const size_t nk = keys.size();
                for (size_t q = 0; q < nk; q++) {
                    if (q + 16 < nk) c.prefetch_hash(keys[q + 16]);
                    if (q + 4 < nk) c.prefetch_entry(keys[q + 4]);
                    try_upgrade(keys[q], q);
                }
            }
        });

        // ---- 6. reset the readers masks for the next batch --------------
        pool_.parallel_for(n_chunks, [&](int c) {
            for (key_t_ k : touched_[c]) readers_[k] = MaskT(0);
        });
        lap(3);
        return mp;
    }

    // config (ids_ is borrowed — the Python binding pins the buffer)
    const key_t_ *ids_;
    int64_t num_samples_;
    int num_tables_, nrank_, mbs_;
    int pos_bits_ = 0;   // bits to pack a batch position next to a key
    int64_t batch_num_;
    int epochs_, flush_cap_, owner_cap_, num_shards_;
    int64_t rows_per_shard_;
    int top_k_, n_threads_, queue_cap_, assign_mode_;
    int64_t pinned_, cache_rows_;
    int bound_;
    int pull_target_, hoist_window_, prefetch_cap_;
    int64_t shuffle_seed_;
    std::vector<int64_t> perm_;        // per-epoch sample permutation
    int64_t perm_epoch_ = -1;
    key_t_ key_space_;
    std::vector<int> order_;

    // planner state
    std::vector<SlotCache> caches_;
    std::vector<MaskT> state_;
    std::vector<long> miss_pull_, miss_push_, update_pull_, update_push_;
    std::vector<long> deferred_flush_, hoisted_;
    mutable long iter_sum_ = 0, iter_cnt_ = 0;
    mutable long phase_us_[4] = {0, 0, 0, 0};

    // plan scratch (background thread + pool only)
    std::vector<std::vector<key_t_>> batch_keys_;  // per-worker sorted uniq
    std::vector<std::vector<uint8_t>> batch_predirty_;
    std::vector<int32_t> local_of_slot_;   // slot -> batch-local sample
    std::vector<int32_t> worker_of_local_; // batch-local sample -> worker
    std::vector<MaskT> readers_;           // key -> workers reading it
                                           //   this batch (zeroed after)
    std::vector<std::vector<key_t_>> touched_;   // [chunk] first-touched
    std::vector<std::vector<key_t_>> prezero_;   // [chunk] keys whose
                                                 //   pre-batch word was 0
    std::unordered_set<key_t_> prezero_set_;     // merged per batch
    std::vector<std::vector<key_t_>> stale_cand_;  // [holder] keys whose
                                                   //   staleness moves
                                                   //   this batch
    std::vector<HoistInfo> hoist_scratch_;       // per worker, per batch
    std::vector<std::vector<int>> pull_used_scratch_;  // [z][owner]
    std::unordered_map<key_t_, int64_t> recent_flush_; // key -> last flush
                                                       //   batch (window)

    bool hoisting_on() const {
        return hoist_window_ > 0 && pull_target_ > 0 && prefetch_cap_ > 0;
    }
    // [chunk][holder] -> unique keys the holder held dirty pre-batch and
    // someone reads this batch (planned-flush candidates)
    std::vector<std::vector<std::vector<key_t_>>> cand_;

    Pool pool_;

    // queue
    std::deque<MicroProgram> queue_;
    std::mutex mut_;
    std::condition_variable cv_pop_, cv_push_;
    bool done_ = false;
    std::atomic<bool> close_{false};
    std::thread worker_;
};

IPlanner *make_planner(const key_t_ *ids, int64_t num_samples,
                       int num_tables, int nrank, int mbs,
                       int64_t batch_num, int epochs, int64_t cache_rows,
                       int flush_cap, int owner_cap, int num_shards,
                       int64_t rows_per_shard, int top_k,
                       const int *table_order, int n_threads, int queue_cap,
                       int policy, int assign_mode, int64_t pinned,
                       int bound, int pull_target, int hoist_window,
                       int prefetch_cap, int64_t shuffle_seed) {
    auto build = [&](auto tag) -> IPlanner * {
        using MaskT = decltype(tag);
        return new CachePlannerT<MaskT>(
            ids, num_samples, num_tables, nrank, mbs, batch_num, epochs,
            cache_rows, flush_cap, owner_cap, num_shards, rows_per_shard,
            top_k, table_order, n_threads, queue_cap, policy, assign_mode,
            pinned, bound, pull_target, hoist_window, prefetch_cap,
            shuffle_seed);
    };
    if (nrank <= 8) return build(uint16_t{});
    if (nrank <= 16) return build(uint32_t{});
    if (nrank <= 32) return build(uint64_t{});
    if (nrank <= 64) return build((unsigned __int128){});
    throw std::invalid_argument(
        "CachePlanner supports at most 64 workers per planner (nrank="
        + std::to_string(nrank) + "); shard planning per host "
        "(BroadcastPlanner fan-out, sched/service.py)");
}

} // namespace herald

// ---------------------------------------------------------------------
// C ABI. `ids` is BORROWED for the planner's lifetime — the Python
// binding pins the numpy buffer (planner.py _ids_keepalive).
// ---------------------------------------------------------------------
struct HPlanner {
    herald::IPlanner *planner;
    herald::MicroProgram current;
};

extern "C" {

void *hplan_create(const int64_t *ids, int64_t num_samples, int num_tables,
                   int nrank, int mbs, int64_t batch_num, int epochs,
                   int64_t cache_rows, int flush_cap, int owner_cap,
                   int num_shards, int64_t rows_per_shard, int top_k,
                   const int *table_order, int n_threads, int queue_cap,
                   int policy, int assign_mode, int64_t pinned, int bound,
                   int pull_target, int hoist_window, int prefetch_cap,
                   int64_t shuffle_seed) {
    try {
        auto *h = new HPlanner();
        h->planner = herald::make_planner(
            ids, num_samples, num_tables, nrank, mbs, batch_num, epochs,
            cache_rows, flush_cap, owner_cap, num_shards, rows_per_shard,
            top_k, table_order, n_threads, queue_cap, policy, assign_mode,
            pinned, bound, pull_target, hoist_window, prefetch_cap,
            shuffle_seed);
        return h;
    } catch (const std::exception &e) {
        fprintf(stderr, "hplan_create failed: %s\n", e.what());
        return nullptr;
    }
}

void hplan_start(void *h) { static_cast<HPlanner *>(h)->planner->start(); }

// Phase 1: fill assign [nrank*mbs]; sizes_out [nrank*2] = (u, f) per worker.
// Returns 0 ok, -1 end of stream.
int hplan_pop_begin(void *h, int64_t *assign_out, int64_t *sizes_out) {
    auto *p = static_cast<HPlanner *>(h);
    if (!p->planner->pop(p->current)) return -1;
    std::memcpy(assign_out, p->current.assign.data(),
                p->current.assign.size() * sizeof(int64_t));
    size_t nr = p->current.slots.size();
    for (size_t z = 0; z < nr; z++) {
        sizes_out[2 * z] = int64_t(p->current.slots[z].size());
        sizes_out[2 * z + 1] = int64_t(p->current.flush_ids[z].size());
    }
    return 0;
}

// Phase 2: copy concatenated per-worker arrays.
void hplan_pop_finish(void *h, int32_t *slots_out, uint8_t *pulls_out,
                      int64_t *flush_ids_out, int32_t *flush_slots_out) {
    auto *p = static_cast<HPlanner *>(h);
    int64_t uo = 0, fo = 0;
    size_t nr = p->current.slots.size();
    for (size_t z = 0; z < nr; z++) {
        auto &sl = p->current.slots[z];
        auto &pu = p->current.pulls[z];
        std::memcpy(slots_out + uo, sl.data(), sl.size() * sizeof(int32_t));
        std::memcpy(pulls_out + uo, pu.data(), pu.size());
        uo += int64_t(sl.size());
        auto &fi = p->current.flush_ids[z];
        auto &fs = p->current.flush_slots[z];
        std::memcpy(flush_ids_out + fo, fi.data(),
                    fi.size() * sizeof(int64_t));
        std::memcpy(flush_slots_out + fo, fs.data(),
                    fs.size() * sizeof(int32_t));
        fo += int64_t(fi.size());
    }
}

// One-shot pop writing DIRECTLY into padded device-layout buffers:
// assign [nrank*mbs], slots/pulls rows of width u_cap (pad: cache_rows /
// 0), flush rows of width f_cap (pad: -1 / cache_rows), flush ids emitted
// as int32 (the engine ships programs to the device as int32). Replaces
// pop_begin+pop_finish plus the Python-side pad-and-stack, which cost as
// much as the device step at single-chip scale. Returns 0 ok, -1 end of
// stream, -2 a worker's uniques/flushes exceed the given caps (caller
// must treat as fatal: truncation would corrupt training).
static int pad_program(const herald::MicroProgram &cur, int64_t *assign_out,
                       int64_t u_cap, int64_t f_cap, int64_t p_cap,
                       int64_t cache_rows, int32_t *slots_out,
                       uint8_t *pulls_out, int32_t *flush_ids_out,
                       int32_t *flush_slots_out, int32_t *prefetch_ids_out,
                       int32_t *prefetch_slots_out, int32_t *uniq_out,
                       int32_t *inv_out) {
    std::memcpy(assign_out, cur.assign.data(),
                cur.assign.size() * sizeof(int64_t));
    size_t nr = cur.slots.size();
    for (size_t z = 0; z < nr; z++) {
        auto &sl = cur.slots[z];
        auto &pu = cur.pulls[z];
        auto &fi = cur.flush_ids[z];
        auto &fs = cur.flush_slots[z];
        auto &pfi = cur.prefetch_ids[z];
        auto &pfs = cur.prefetch_slots[z];
        if (int64_t(sl.size()) > u_cap || int64_t(fi.size()) > f_cap
            || int64_t(pfi.size()) > p_cap)
            return -2;
        int32_t *pirow = prefetch_ids_out + z * p_cap;
        int32_t *psrow = prefetch_slots_out + z * p_cap;
        for (size_t q = 0; q < pfi.size(); q++) {
            pirow[q] = int32_t(pfi[q]);
            psrow[q] = pfs[q];
        }
        for (int64_t q = int64_t(pfi.size()); q < p_cap; q++) {
            pirow[q] = -1;
            psrow[q] = int32_t(cache_rows);
        }
        int32_t *srow = slots_out + z * u_cap;
        uint8_t *prow = pulls_out + z * u_cap;
        std::memcpy(srow, sl.data(), sl.size() * sizeof(int32_t));
        std::memcpy(prow, pu.data(), pu.size());
        for (int64_t q = int64_t(sl.size()); q < u_cap; q++) {
            srow[q] = int32_t(cache_rows);
            prow[q] = 0;
        }
        // host-side dedup: sorted unique keys (pad -1 = jnp.unique's
        // fill sentinel) + the full-length inverse map (one entry per
        // (sample, table) position, no padding needed)
        auto &uk = cur.uniq_keys[z];
        int32_t *urow = uniq_out + z * u_cap;
        for (size_t q = 0; q < uk.size(); q++)
            urow[q] = int32_t(uk[q]);
        for (int64_t q = int64_t(uk.size()); q < u_cap; q++)
            urow[q] = -1;
        auto &iv = cur.inv[z];
        std::memcpy(inv_out + z * int64_t(iv.size()), iv.data(),
                    iv.size() * sizeof(int32_t));
        int32_t *firow = flush_ids_out + z * f_cap;
        int32_t *fsrow = flush_slots_out + z * f_cap;
        for (size_t q = 0; q < fi.size(); q++) {
            firow[q] = int32_t(fi[q]);
            fsrow[q] = fs[q];
        }
        for (int64_t q = int64_t(fi.size()); q < f_cap; q++) {
            firow[q] = -1;
            fsrow[q] = int32_t(cache_rows);
        }
    }
    return 0;
}

int hplan_pop_padded(void *h, int64_t *assign_out, int64_t u_cap,
                     int64_t f_cap, int64_t p_cap, int64_t cache_rows,
                     int32_t *slots_out, uint8_t *pulls_out,
                     int32_t *flush_ids_out, int32_t *flush_slots_out,
                     int32_t *prefetch_ids_out,
                     int32_t *prefetch_slots_out, int32_t *uniq_out,
                     int32_t *inv_out) {
    auto *p = static_cast<HPlanner *>(h);
    if (!p->planner->pop(p->current)) return -1;
    return pad_program(p->current, assign_out, u_cap, f_cap, p_cap,
                       cache_rows, slots_out, pulls_out, flush_ids_out,
                       flush_slots_out, prefetch_ids_out,
                       prefetch_slots_out, uniq_out, inv_out);
}

// Pop up to `steps` programs in ONE call into STACKED padded buffers
// (row k of each buffer is program k's device layout; row strides are
// the single-program sizes: assign nrank*mbs, slots/pulls nrank*u_cap,
// flush nrank*f_cap, prefetch nrank*p_cap). Blocks on the producer as
// needed — one GIL release and one ctypes call per chunk instead of per
// step, which on a single-core host removes a per-pop Python/ctypes/
// condvar round trip comparable to the planning work itself.
// Returns K >= 0 programs written (0 = end of stream), or -2 if a
// program exceeded the caps (fatal: truncation would corrupt training).
int64_t hplan_pop_chunk_padded(void *h, int64_t steps, int64_t nrank_mbs,
                               int64_t *assign_out, int64_t u_cap,
                               int64_t f_cap, int64_t p_cap,
                               int64_t cache_rows, int32_t *slots_out,
                               uint8_t *pulls_out, int32_t *flush_ids_out,
                               int32_t *flush_slots_out,
                               int32_t *prefetch_ids_out,
                               int32_t *prefetch_slots_out,
                               int32_t *uniq_out, int32_t *inv_out,
                               int64_t inv_row) {
    auto *p = static_cast<HPlanner *>(h);
    size_t nr = 0;
    for (int64_t k = 0; k < steps; k++) {
        if (!p->planner->pop(p->current)) return k;
        nr = p->current.slots.size();
        int rc = pad_program(
            p->current, assign_out + k * nrank_mbs, u_cap, f_cap, p_cap,
            cache_rows, slots_out + k * int64_t(nr) * u_cap,
            pulls_out + k * int64_t(nr) * u_cap,
            flush_ids_out + k * int64_t(nr) * f_cap,
            flush_slots_out + k * int64_t(nr) * f_cap,
            prefetch_ids_out + k * int64_t(nr) * p_cap,
            prefetch_slots_out + k * int64_t(nr) * p_cap,
            uniq_out + k * int64_t(nr) * u_cap,
            inv_out + k * inv_row);
        if (rc != 0) return -2;
    }
    return steps;
}

int64_t hplan_queue_length(void *h) {
    return int64_t(static_cast<HPlanner *>(h)->planner->queue_length());
}

void hplan_perf(void *h, long *out5) {
    static_cast<HPlanner *>(h)->planner->perf(out5);
}

long hplan_iter_time_us(void *h) {
    return static_cast<HPlanner *>(h)->planner->iter_time_us();
}

// cumulative per-phase planning µs: [score, assign, plan, stale]
void hplan_phase_times(void *h, long *out4) {
    static_cast<HPlanner *>(h)->planner->phase_times(out4);
}

// Fill ids/slots with worker's dirty rows; returns count. Call with
// nullptr buffers to query the count first.
int64_t hplan_dirty_dump(void *h, int worker, int64_t *ids_out,
                         int32_t *slots_out) {
    auto *p = static_cast<HPlanner *>(h);
    if (!p->planner->finished()) return -1;
    std::vector<int64_t> ids;
    std::vector<int32_t> slots;
    p->planner->dirty_dump(worker, ids, slots);
    if (ids_out) {
        std::memcpy(ids_out, ids.data(), ids.size() * sizeof(int64_t));
        std::memcpy(slots_out, slots.data(), slots.size() * sizeof(int32_t));
    }
    return int64_t(ids.size());
}

void hplan_destroy(void *h) {
    auto *p = static_cast<HPlanner *>(h);
    delete p->planner;
    delete p;
}

} // extern "C"

// ABI guard — see herald_sched.cc tail note.
#ifndef HERALD_ABI_HASH
#define HERALD_ABI_HASH 0L
#endif
extern "C" long herald_abi_hash() { return HERALD_ABI_HASH; }
