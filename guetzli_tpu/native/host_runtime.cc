// Native host runtime for guetzli_tpu: the hot host-side paths of the
// optimizer (entropy-size estimation, Huffman construction, symbol
// streams, bitstream packing) as a C-ABI shared library consumed via
// ctypes.
//
// Semantics mirror the Python reference implementations in
// guetzli_tpu/jpeg/huffman.py, guetzli_tpu/jpeg/writer.py and
// guetzli_tpu/entropy/histogram.py (which in turn match the reference
// encoder's behavior: guetzli/entropy_encode.cc:76-147,
// guetzli/jpeg_data_writer.cc:188-355). Byte-level parity is enforced by
// the test suite (serializer goldens vs the reference oracle).
//
// Build: guetzli_tpu/native/build.sh  ->  libgtpu_host.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kHistSize = 257;  // 256 symbols + sentinel
constexpr int kMaxBitLength = 16;

// ---------------------------------------------------------------------
// Length-limited Huffman depth assignment.
// Tie-breaking contract (same as the Python twin): leaves ordered by
// (count asc, symbol desc); on equal counts a leaf merges before an
// internal node; depth overflow resolved by doubling a lower bound on
// leaf counts and retrying.
// ---------------------------------------------------------------------

struct Node {
  int64_t weight;
  int32_t left;   // -1 for leaf
  int32_t right;  // symbol for leaf
};

void HuffmanDepths(const int64_t* hist, int n, int limit, int32_t* depths) {
  std::fill(depths, depths + n, 0);
  std::vector<std::pair<int64_t, int32_t>> leaves;  // (count, -symbol)
  leaves.reserve(n);
  for (int64_t count_limit = 1;; count_limit *= 2) {
    leaves.clear();
    for (int s = 0; s < n; ++s) {
      if (hist[s] > 0) {
        leaves.emplace_back(std::max<int64_t>(hist[s], count_limit), -s);
      }
    }
    if (leaves.empty()) return;
    std::sort(leaves.begin(), leaves.end());
    if (leaves.size() == 1) {
      std::fill(depths, depths + n, 0);
      depths[-leaves[0].second] = 1;
      return;
    }
    // Two-queue merge: sorted leaves + FIFO internal nodes; leaf wins ties.
    size_t n_leaves = leaves.size();
    std::vector<Node> nodes;
    nodes.reserve(2 * n_leaves);
    for (auto& lw : leaves) {
      nodes.push_back(Node{lw.first, -1, -lw.second});
    }
    std::vector<int32_t> internal;  // indices into nodes
    internal.reserve(n_leaves);
    size_t li = 0, ii = 0;
    auto take = [&]() -> int32_t {
      bool has_leaf = li < n_leaves;
      bool has_int = ii < internal.size();
      if (!has_int ||
          (has_leaf && nodes[li].weight <= nodes[internal[ii]].weight)) {
        return static_cast<int32_t>(li++);
      }
      return internal[ii++];
    };
    for (size_t k = 0; k + 1 < n_leaves; ++k) {
      int32_t a = take();
      int32_t b = take();
      nodes.push_back(Node{nodes[a].weight + nodes[b].weight, a, b});
      internal.push_back(static_cast<int32_t>(nodes.size() - 1));
    }
    // Depth assignment from the root (last internal), children created
    // before parents so a reverse sweep suffices.
    std::vector<int32_t> depth_of(nodes.size(), 0);
    bool ok = true;
    std::fill(depths, depths + n, 0);
    for (int32_t i = static_cast<int32_t>(nodes.size()) - 1; i >= 0; --i) {
      const Node& nd = nodes[i];
      if (nd.left < 0) {  // leaf
        if (depth_of[i] > limit) {
          ok = false;
          break;
        }
        depths[nd.right] = depth_of[i];
      } else {
        depth_of[nd.left] = depth_of[i] + 1;
        depth_of[nd.right] = depth_of[i] + 1;
      }
    }
    if (ok) return;
  }
}

int64_t HistogramHeaderCostBits(const int64_t* h) {
  int64_t nz = 0;
  for (int i = 0; i < 256; ++i) nz += (h[i] != 0);
  return 17 * 8 + 8 * nz;
}

int64_t HistogramEntropyCostBits(const int64_t* h, const int32_t* depths) {
  int64_t bits = 0;
  for (int i = 0; i < 256; ++i) {
    bits += (h[i] / 2) * (depths[i] + (i & 0xF));
  }
  bits += (bits * 3 + 512) >> 10;  // escape-byte fudge
  return bits;
}

// Greedy trailing-pair clustering (reference ClusterHistograms semantics).
// histos: k x 257 (modified in place working copy). Outputs per-input
// cluster indexes and per-cluster depths; returns number of clusters.
int Cluster(std::vector<std::vector<int64_t>>& histos,
            std::vector<int32_t>& indexes,
            std::vector<std::vector<int32_t>>& depths,
            std::vector<int64_t>& costs) {
  int n = static_cast<int>(histos.size());
  indexes.resize(n);
  depths.assign(n, std::vector<int32_t>(kHistSize, 0));
  costs.resize(n);
  for (int i = 0; i < n; ++i) {
    indexes[i] = i;
    HuffmanDepths(histos[i].data(), kHistSize, kMaxBitLength,
                  depths[i].data());
    costs[i] = HistogramHeaderCostBits(histos[i].data()) +
               HistogramEntropyCostBits(histos[i].data(), depths[i].data());
  }
  int num = n;
  while (num > 1) {
    int last = num - 1, second = num - 2;
    std::vector<int64_t> combined(kHistSize);
    for (int i = 0; i < kHistSize; ++i)
      combined[i] = histos[last][i] + histos[second][i];
    combined[kHistSize - 1] = 1;
    std::vector<int32_t> d(kHistSize, 0);
    HuffmanDepths(combined.data(), kHistSize, kMaxBitLength, d.data());
    int64_t cost = HistogramHeaderCostBits(combined.data()) +
                   HistogramEntropyCostBits(combined.data(), d.data());
    if (cost < costs[last] + costs[second]) {
      histos[second] = combined;
      std::fill(histos[last].begin(), histos[last].end(), 0);
      histos[last][kHistSize - 1] = 1;
      costs[second] = cost;
      depths[second] = d;
      for (int i = 0; i < n; ++i)
        if (indexes[i] == last) indexes[i] = second;
      --num;
    } else {
      break;
    }
  }
  return num;
}

inline int NBits(int64_t v) {
  uint64_t a = v < 0 ? -v : v;
  int n = 0;
  while (a) {
    ++n;
    a >>= 1;
  }
  return n;
}

}  // namespace

extern "C" {

// depths[257] <- length-limited Huffman depths of hist[257].
void gtpu_huffman_depths(const int64_t* hist, int32_t n, int32_t limit,
                         int32_t* depths) {
  HuffmanDepths(hist, n, limit, depths);
}

// Total clustered cost in bytes for k histograms (k x 257 row-major).
int64_t gtpu_cluster_cost(const int64_t* histos_in, int32_t k) {
  std::vector<std::vector<int64_t>> histos(
      k, std::vector<int64_t>(kHistSize));
  for (int i = 0; i < k; ++i)
    std::memcpy(histos[i].data(), histos_in + i * kHistSize,
                kHistSize * sizeof(int64_t));
  std::vector<int32_t> indexes;
  std::vector<std::vector<int32_t>> depths;
  std::vector<int64_t> costs;
  int num = Cluster(histos, indexes, depths, costs);
  int64_t total = 0;
  for (int i = 0; i < num; ++i) total += costs[i];
  return (total + 7) / 8;
}

// Full clustering for the serializer: fills clustered histos (k x 257),
// per-input indexes (k), per-cluster depths (k x 257); returns #clusters.
int32_t gtpu_cluster_full(const int64_t* histos_in, int32_t k,
                          int64_t* clustered_out, int32_t* indexes_out,
                          int32_t* depths_out) {
  std::vector<std::vector<int64_t>> histos(
      k, std::vector<int64_t>(kHistSize));
  for (int i = 0; i < k; ++i)
    std::memcpy(histos[i].data(), histos_in + i * kHistSize,
                kHistSize * sizeof(int64_t));
  std::vector<int32_t> indexes;
  std::vector<std::vector<int32_t>> depths;
  std::vector<int64_t> costs;
  int num = Cluster(histos, indexes, depths, costs);
  for (int i = 0; i < num; ++i) {
    std::memcpy(clustered_out + i * kHistSize, histos[i].data(),
                kHistSize * sizeof(int64_t));
    std::memcpy(depths_out + i * kHistSize, depths[i].data(),
                kHistSize * sizeof(int32_t));
  }
  std::memcpy(indexes_out, indexes.data(), k * sizeof(int32_t));
  return num;
}

// The optimizer's in-loop size estimate (_entropy_size): cluster the k AC
// histograms, then header bytes + ceil(total entropy bits / 8) where each
// input histogram is costed against its cluster's depths.
int64_t gtpu_entropy_size(const int64_t* histos_in, int32_t k) {
  std::vector<std::vector<int64_t>> histos(
      k, std::vector<int64_t>(kHistSize));
  for (int i = 0; i < k; ++i)
    std::memcpy(histos[i].data(), histos_in + i * kHistSize,
                kHistSize * sizeof(int64_t));
  std::vector<std::vector<int64_t>> inputs = histos;
  std::vector<int32_t> indexes;
  std::vector<std::vector<int32_t>> depths;
  std::vector<int64_t> costs;
  int num = Cluster(histos, indexes, depths, costs);
  int64_t header = 0;
  for (int i = 0; i < num; ++i)
    header += HistogramHeaderCostBits(histos[i].data()) / 8;
  int64_t bits = 0;
  for (int i = 0; i < k; ++i)
    bits += HistogramEntropyCostBits(inputs[i].data(),
                                     depths[indexes[i]].data());
  return header + (bits + 7) / 8;
}

// Per-block AC histograms: zz (n x 64 int32, zigzag order) -> out
// (n x 256 int64), x2 counting, ZRL/EOB included (EOB when the last
// nonzero is before position 63).
void gtpu_block_ac_histograms(const int32_t* zz, int64_t n, int64_t* out) {
  std::memset(out, 0, n * 256 * sizeof(int64_t));
  for (int64_t b = 0; b < n; ++b) {
    const int32_t* row = zz + b * 64;
    int64_t* h = out + b * 256;
    int run = 0;
    int last_nz = 0;
    for (int k = 1; k < 64; ++k) {
      if (row[k] == 0) {
        ++run;
        continue;
      }
      while (run > 15) {
        h[0xF0] += 2;
        run -= 16;
      }
      int nb = NBits(row[k]);
      h[(run << 4) | nb] += 2;
      run = 0;
      last_nz = k;
    }
    if (last_nz < 63) h[0] += 2;  // EOB
  }
}

// Total AC histogram of one component directly from the NATURAL-order
// dequantized state grid (strided rows), with the quant division and
// zigzag reorder folded into the pass — the chunk-boundary entropy
// refresh needs only this total, not the (n x 256) per-block
// materialization (which cost ~0.2 s per chunk at 1 MPix on a 1-core
// host). nat: rows at nat + b*stride, 64 natural-order int32 multiples
// of quant; quant: 64 natural-order; zig: zigzag position -> natural
// index (NATURAL_ORDER). ADDS x2 counts into out (256).
void gtpu_total_ac_hist_nat(const int32_t* nat, int64_t stride,
                            const int32_t* quant, const int32_t* zig,
                            int64_t n, int64_t* out) {
  for (int64_t b = 0; b < n; ++b) {
    const int32_t* row = nat + b * stride;
    int run = 0;
    int last_nz = 0;
    for (int k = 1; k < 64; ++k) {
      int32_t v = row[zig[k]] / quant[zig[k]];
      if (v == 0) {
        ++run;
        continue;
      }
      while (run > 15) {
        out[0xF0] += 2;
        run -= 16;
      }
      out[(run << 4) | NBits(v)] += 2;
      run = 0;
      last_nz = k;
    }
    if (last_nz < 63) out[0] += 2;  // EOB
  }
}

// Sum of per-block AC histograms over all blocks, plus DC histogram:
// one pass over a whole component. dc_hist/ac_hist are 257 int64
// (caller-initialized; this ADDS 2x counts, leaving sentinels alone).
void gtpu_component_histograms(const int32_t* zz, int64_t n,
                               int64_t* dc_hist, int64_t* ac_hist) {
  int64_t prev_dc = 0;
  for (int64_t b = 0; b < n; ++b) {
    const int32_t* row = zz + b * 64;
    int64_t diff = static_cast<int64_t>(row[0]) - prev_dc;
    prev_dc = row[0];
    dc_hist[NBits(diff)] += 2;
    int run = 0;
    int last_nz = 0;
    for (int k = 1; k < 64; ++k) {
      if (row[k] == 0) {
        ++run;
        continue;
      }
      while (run > 15) {
        ac_hist[0xF0] += 2;
        run -= 16;
      }
      ac_hist[(run << 4) | NBits(row[k])] += 2;
      run = 0;
      last_nz = k;
    }
    if (last_nz < 63) ac_hist[0] += 2;
  }
}

// Entropy-coded scan assembly: one component's contribution as
// (value, nbits) pairs would be the Python shape; instead this packs the
// WHOLE interleaved scan directly into bytes with 0xFF stuffing.
//
// Inputs are per-component arrays concatenated:
//   zz:       sum(n_c) x 64 zigzag coefficients (traversal order)
//   n_blocks: per-component block counts (ncomp)
//   hv:       per-component h*v (blocks per MCU)
//   dc_codes/dc_depths/ac_codes/ac_depths: ncomp x 256 int32
// Returns number of bytes written (or -1 if cap exceeded).
int64_t gtpu_encode_scan(const int32_t* zz, const int64_t* n_blocks,
                         const int32_t* hv, int32_t ncomp,
                         const int32_t* dc_codes, const int32_t* dc_depths,
                         const int32_t* ac_codes, const int32_t* ac_depths,
                         uint8_t* out, int64_t cap) {
  // Bit writer state (64-bit buffer, flush high bytes with stuffing).
  uint64_t buf = 0;
  int nbits = 0;
  int64_t pos = 0;
  bool overflow = false;
  auto put = [&](uint64_t bits, int len) {
    if (len == 0) return;
    nbits += len;
    buf |= bits << (64 - nbits);
    while (nbits >= 8) {
      uint8_t byte = static_cast<uint8_t>(buf >> 56);
      if (pos >= cap) {
        overflow = true;
        return;
      }
      out[pos++] = byte;
      if (byte == 0xFF) {
        if (pos >= cap) {
          overflow = true;
          return;
        }
        out[pos++] = 0;
      }
      buf <<= 8;
      nbits -= 8;
    }
  };

  // Component base offsets into zz and per-component cursor state.
  std::vector<int64_t> base(ncomp, 0);
  for (int c = 1; c < ncomp; ++c) base[c] = base[c - 1] + n_blocks[c - 1];
  std::vector<int64_t> next_block(ncomp, 0);
  std::vector<int64_t> prev_dc(ncomp, 0);

  int64_t n_mcus = (ncomp > 0 && hv[0] > 0) ? n_blocks[0] / hv[0] : 0;
  for (int64_t m = 0; m < n_mcus && !overflow; ++m) {
    for (int c = 0; c < ncomp; ++c) {
      for (int j = 0; j < hv[c]; ++j) {
        const int32_t* row = zz + (base[c] + next_block[c]) * 64;
        ++next_block[c];
        // DC
        int64_t diff = static_cast<int64_t>(row[0]) - prev_dc[c];
        prev_dc[c] = row[0];
        int nb = NBits(diff);
        put(static_cast<uint32_t>(dc_codes[c * 256 + nb]),
            dc_depths[c * 256 + nb]);
        if (nb) {
          uint64_t mag = static_cast<uint64_t>(diff < 0 ? diff - 1 : diff) &
                         ((1ull << nb) - 1);
          put(mag, nb);
        }
        // AC
        int run = 0;
        int last_nz = 0;
        for (int k = 1; k < 64; ++k) {
          if (row[k] == 0) {
            ++run;
            continue;
          }
          while (run > 15) {
            put(static_cast<uint32_t>(ac_codes[c * 256 + 0xF0]),
                ac_depths[c * 256 + 0xF0]);
            run -= 16;
          }
          int vb = NBits(row[k]);
          int sym = (run << 4) | vb;
          put(static_cast<uint32_t>(ac_codes[c * 256 + sym]),
              ac_depths[c * 256 + sym]);
          uint64_t mag =
              static_cast<uint64_t>(row[k] < 0 ? row[k] - 1 : row[k]) &
              ((1ull << vb) - 1);
          put(mag, vb);
          run = 0;
          last_nz = k;
        }
        if (last_nz < 63)
          put(static_cast<uint32_t>(ac_codes[c * 256 + 0]),
              ac_depths[c * 256 + 0]);
      }
    }
  }
  // Pad the final partial byte with 1s.
  if (nbits % 8) put((1u << (8 - nbits % 8)) - 1, 8 - nbits % 8);
  return overflow ? -1 : pos;
}

// Histogram delta for a candidate application: out[256] +=
// (sum of new-row AC histograms) - (sum of perblock[touched] rows).
// rows_div: (T, 64) quant-divided coefficients in NATURAL order; zigzag:
// 64-entry map from zigzag position -> natural index.
void gtpu_delta_hist(const int64_t* perblock, const int64_t* touched,
                     int64_t t_count, const int32_t* rows_div,
                     const int32_t* zigzag, int64_t* out) {
  for (int64_t t = 0; t < t_count; ++t) {
    const int64_t* pb = perblock + touched[t] * 256;
    for (int k = 0; k < 256; ++k) out[k] -= pb[k];
  }
  for (int64_t t = 0; t < t_count; ++t) {
    const int32_t* row = rows_div + t * 64;
    int run = 0;
    int last_nz = 0;
    for (int k = 1; k < 64; ++k) {
      int32_t v = row[zigzag[k]];
      if (v == 0) {
        ++run;
        continue;
      }
      while (run > 15) {
        out[0xF0] += 2;
        run -= 16;
      }
      out[(run << 4) | NBits(v)] += 2;
      run = 0;
      last_nz = k;
    }
    if (last_nz < 63) out[0] += 2;
  }
}

// Commits an accepted application: rewrites perblock[touched] from the new
// rows and applies the net delta to base_hist (first 256 bins).
void gtpu_commit_hist(int64_t* perblock, const int64_t* touched,
                      int64_t t_count, const int32_t* rows_div,
                      const int32_t* zigzag, int64_t* base_hist) {
  for (int64_t t = 0; t < t_count; ++t) {
    int64_t* pb = perblock + touched[t] * 256;
    for (int k = 0; k < 256; ++k) {
      base_hist[k] -= pb[k];
      pb[k] = 0;
    }
    const int32_t* row = rows_div + t * 64;
    int run = 0;
    int last_nz = 0;
    for (int k = 1; k < 64; ++k) {
      int32_t v = row[zigzag[k]];
      if (v == 0) {
        ++run;
        continue;
      }
      while (run > 15) {
        pb[0xF0] += 2;
        run -= 16;
      }
      pb[(run << 4) | NBits(v)] += 2;
      run = 0;
      last_nz = k;
    }
    if (last_nz < 63) pb[0] += 2;
    for (int k = 0; k < 256; ++k) base_hist[k] += pb[k];
  }
}

// Global-order construction for the refinement loop (the twin of
// processor._build_global_order + the stable argsort that follows it):
// for direction>0 collect (block, (err - max_block_error)/weight) for
// candidate slots in [last_index, count); for direction<0 the slots in
// [0, last_index) with negated deltas. Output sorted ascending by value
// (stable). Returns the number of entries; blocks_to_change via out-param.
int64_t gtpu_global_order(const float* cand_err, const int64_t* cand_count,
                          const int64_t* last_indexes,
                          const float* block_weight,
                          const double* max_block_error, int64_t n,
                          int64_t steps, int32_t direction,
                          int32_t* out_blocks, double* out_vals,
                          int64_t cap, int64_t* blocks_to_change_out) {
  std::vector<std::pair<double, int64_t>> entries;  // (val, order_key)
  std::vector<int32_t> blocks;
  entries.reserve(1024);
  blocks.reserve(1024);
  int64_t blocks_to_change = 0;
  int64_t key = 0;
  for (int64_t b = 0; b < n; ++b) {
    double w = block_weight[b];
    if (w <= 0) continue;
    int64_t li = last_indexes[b];
    if (direction > 0) {
      if (li < cand_count[b]) ++blocks_to_change;
      for (int64_t t = li; t < cand_count[b]; ++t) {
        double val = (static_cast<double>(cand_err[b * steps + t]) -
                      max_block_error[b]) / w;
        entries.emplace_back(val, key++);
        blocks.push_back(static_cast<int32_t>(b));
      }
    } else {
      if (li > 0) ++blocks_to_change;
      for (int64_t t = 0; t < li; ++t) {
        double val = (max_block_error[b] -
                      static_cast<double>(cand_err[b * steps + t])) / w;
        entries.emplace_back(val, key++);
        blocks.push_back(static_cast<int32_t>(b));
      }
    }
  }
  *blocks_to_change_out = blocks_to_change;
  int64_t total = static_cast<int64_t>(entries.size());
  if (total > cap) return -1;
  std::vector<int64_t> order(total);
  for (int64_t i = 0; i < total; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b2) {
                     return entries[a].first < entries[b2].first;
                   });
  for (int64_t i = 0; i < total; ++i) {
    out_blocks[i] = blocks[order[i]];
    out_vals[i] = entries[order[i]].first;
  }
  return total;
}

// MSB-first variable-length packing with 0xFF stuffing (the generic
// _pack_bits twin, used by tests).
int64_t gtpu_pack_bits(const int64_t* values, const int32_t* lengths,
                       int64_t n, uint8_t* out, int64_t cap) {
  uint64_t buf = 0;
  int nbits = 0;
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    int len = lengths[i];
    if (!len) continue;
    if (len > 57) return -2;  // carry (<=7) + len must fit in the u64 buffer
    nbits += len;
    buf |= (static_cast<uint64_t>(values[i]) & ((len >= 64 ? ~0ull : ((1ull << len) - 1)))) << (64 - nbits);
    while (nbits >= 8) {
      uint8_t byte = static_cast<uint8_t>(buf >> 56);
      if (pos >= cap) return -1;
      out[pos++] = byte;
      if (byte == 0xFF) {
        if (pos >= cap) return -1;
        out[pos++] = 0;
      }
      buf <<= 8;
      nbits -= 8;
    }
  }
  if (nbits) {
    int pad = 8 - nbits;
    uint8_t byte = static_cast<uint8_t>((buf >> 56) | ((1u << pad) - 1));
    if (pos >= cap) return -1;
    out[pos++] = byte;
    if (byte == 0xFF) {
      if (pos >= cap) return -1;
      out[pos++] = 0;
    }
  }
  return pos;
}

}  // extern "C"
