// Native eventalign.txt parsing core.
//
// The framework's dataprep hot path is TSV parsing + per-read aggregation
// (the reference spends its time in pandas for the same work,
// reference: m6anet/utils/dataprep_utils.py:245-323).  This library provides:
//
//   ea_index(path, out_path)            streaming (contig, read_index)
//                                       byte-range indexer -> eventalign.index
//   ea_combine_batch(path, starts, ends, n, ...)
//                                       parse+aggregate a transcript's read
//                                       slices: filter reference_kmer ==
//                                       model_kmer, length-weighted mean/std/
//                                       dwell per position (mean rounded to
//                                       1 decimal, position +2 center shift)
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Numeric parity notes: accumulation in double in file order; the 1-decimal
// rounding uses rint (round-half-even) matching numpy.round.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Field {
  const char* p;
  size_t len;
};

// Split a line into at most n_fields tab-separated fields (no copies).
static inline int split_fields(const char* line, const char* end, Field* out,
                               int n_fields) {
  int i = 0;
  const char* p = line;
  while (i < n_fields) {
    const char* tab = static_cast<const char*>(
        memchr(p, '\t', static_cast<size_t>(end - p)));
    if (tab == nullptr) {
      out[i].p = p;
      out[i].len = static_cast<size_t>(end - p);
      return i + 1;
    }
    out[i].p = p;
    out[i].len = static_cast<size_t>(tab - p);
    ++i;
    p = tab + 1;
  }
  return i;
}

static inline bool field_eq(const Field& a, const Field& b) {
  return a.len == b.len && memcmp(a.p, b.p, a.len) == 0;
}

static inline double parse_double(const Field& f) {
  char buf[64];
  size_t n = f.len < 63 ? f.len : 63;
  memcpy(buf, f.p, n);
  buf[n] = '\0';
  return strtod(buf, nullptr);
}

static inline long long parse_ll(const Field& f) {
  long long v = 0;
  bool neg = false;
  const char* p = f.p;
  const char* end = f.p + f.len;
  if (p < end && *p == '-') {
    neg = true;
    ++p;
  }
  for (; p < end; ++p) {
    if (*p < '0' || *p > '9') break;
    v = v * 10 + (*p - '0');
  }
  return neg ? -v : v;
}

}  // namespace

extern "C" {

// Streaming byte-range indexer.  Writes the reference-compatible
// eventalign.index CSV.  Returns number of index rows, or -1 on error.
long long ea_index(const char* path, const char* out_path) {
  FILE* in = fopen(path, "rb");
  if (in == nullptr) return -1;
  FILE* out = fopen(out_path, "w");
  if (out == nullptr) {
    fclose(in);
    return -1;
  }
  fputs("transcript_id,read_index,pos_start,pos_end\n", out);

  const size_t CHUNK = 16u << 20;
  std::vector<char> buf(CHUNK);
  std::string leftover;
  std::string cur_contig, cur_read;
  long long pos = 0, cur_start = 0, rows = 0;
  bool have_cur = false, header_skipped = false;

  auto emit = [&](long long end_pos) {
    fprintf(out, "%s,%s,%lld,%lld\n", cur_contig.c_str(), cur_read.c_str(),
            cur_start, end_pos);
    ++rows;
  };

  for (;;) {
    size_t got = fread(buf.data(), 1, CHUNK, in);
    if (got == 0) break;
    size_t begin = 0;
    for (;;) {
      char* nl = static_cast<char*>(
          memchr(buf.data() + begin, '\n', got - begin));
      if (nl == nullptr) {
        leftover.append(buf.data() + begin, got - begin);
        break;
      }
      size_t line_end = static_cast<size_t>(nl - buf.data());
      const char* line;
      size_t line_len;
      std::string assembled;
      if (!leftover.empty()) {
        assembled.swap(leftover);
        assembled.append(buf.data() + begin, line_end - begin);
        line = assembled.data();
        line_len = assembled.size();
      } else {
        line = buf.data() + begin;
        line_len = line_end - begin;
      }
      long long nbytes = static_cast<long long>(line_len) + 1;
      if (!header_skipped) {
        header_skipped = true;
        pos += nbytes;
        cur_start = pos;
      } else {
        Field f[5];
        int nf = split_fields(line, line + line_len, f, 5);
        if (nf >= 4) {
          if (!have_cur || f[0].len != cur_contig.size() ||
              memcmp(f[0].p, cur_contig.data(), f[0].len) != 0 ||
              f[3].len != cur_read.size() ||
              memcmp(f[3].p, cur_read.data(), f[3].len) != 0) {
            if (have_cur) emit(pos);
            cur_contig.assign(f[0].p, f[0].len);
            cur_read.assign(f[3].p, f[3].len);
            cur_start = pos;
            have_cur = true;
          }
        }
        pos += nbytes;
      }
      begin = line_end + 1;
      if (begin >= got) break;
    }
    if (got < CHUNK) break;
  }
  if (!leftover.empty()) {
    fclose(in);
    fclose(out);
    return -2;  // file must end with newline
  }
  if (have_cur) emit(pos);
  fclose(in);
  fclose(out);
  return rows;
}

// Parse + aggregate a batch of read slices from one eventalign file.
//
// Inputs:  starts/ends — n byte ranges (one per read, header excluded)
// Outputs (caller-allocated, capacity cap):
//   out_pos   int64[cap]      center-shifted positions (sorted per read)
//   out_kmer  uint8[cap*5]    5-mer of each position
//   out_feat  double[cap*3]   (dwell_time, norm_std, norm_mean) per position
//   out_bounds int64[n+1]     prefix: positions per read
// Returns total positions written, or -1 on I/O error, -2 on overflow.
long long ea_combine_batch(const char* path, const int64_t* starts,
                           const int64_t* ends, int64_t n_reads,
                           int64_t* out_pos, uint8_t* out_kmer,
                           double* out_feat, int64_t* out_bounds,
                           int64_t cap) {
  FILE* in = fopen(path, "rb");
  if (in == nullptr) return -1;

  std::vector<char> buf;
  long long total = 0;
  out_bounds[0] = 0;

  struct Acc {
    long long pos;
    char kmer[5];
    double w_sum, mean_sum, std_sum, dwell_sum;
  };
  std::vector<Acc> accs;

  for (int64_t r = 0; r < n_reads; ++r) {
    int64_t len = ends[r] - starts[r];
    buf.resize(static_cast<size_t>(len));
    if (fseeko(in, starts[r], SEEK_SET) != 0 ||
        fread(buf.data(), 1, static_cast<size_t>(len), in) !=
            static_cast<size_t>(len)) {
      fclose(in);
      return -1;
    }
    accs.clear();

    const char* p = buf.data();
    const char* bend = buf.data() + len;
    while (p < bend) {
      const char* nl = static_cast<const char*>(
          memchr(p, '\n', static_cast<size_t>(bend - p)));
      const char* line_end = nl ? nl : bend;
      Field f[15];
      int nf = split_fields(p, line_end, f, 15);
      p = line_end + 1;
      if (nf < 15) continue;
      // reference_kmer (2) == model_kmer (9) filter
      if (!field_eq(f[2], f[9])) continue;
      long long position = parse_ll(f[1]);
      double ev_mean = parse_double(f[6]);
      double ev_stdv = parse_double(f[7]);
      double ev_len = parse_double(f[8]);
      double w = static_cast<double>(parse_ll(f[14]) - parse_ll(f[13]));

      Acc* acc = nullptr;
      // positions arrive in order; check last accumulator first
      if (!accs.empty() && accs.back().pos == position) {
        acc = &accs.back();
      } else {
        for (auto it = accs.rbegin(); it != accs.rend(); ++it) {
          if (it->pos == position) {
            acc = &*it;
            break;
          }
        }
      }
      if (acc == nullptr) {
        accs.push_back(Acc{position, {0, 0, 0, 0, 0}, 0.0, 0.0, 0.0, 0.0});
        acc = &accs.back();
        memcpy(acc->kmer, f[2].p, f[2].len < 5 ? f[2].len : 5);
      }
      acc->w_sum += w;
      acc->mean_sum += ev_mean * w;
      acc->std_sum += ev_stdv * w;
      acc->dwell_sum += ev_len * w;
    }

    // sort by position (insertion order is nearly sorted; simple sort)
    std::sort(accs.begin(), accs.end(),
              [](const Acc& a, const Acc& b) { return a.pos < b.pos; });

    if (total + static_cast<long long>(accs.size()) > cap) {
      fclose(in);
      return -2;
    }
    for (const Acc& a : accs) {
      out_pos[total] = a.pos + 2;
      memcpy(out_kmer + total * 5, a.kmer, 5);
      out_feat[total * 3 + 0] = a.dwell_sum / a.w_sum;
      out_feat[total * 3 + 1] = a.std_sum / a.w_sum;
      out_feat[total * 3 + 2] = rint(a.mean_sum / a.w_sum * 10.0) / 10.0;
      ++total;
    }
    out_bounds[r + 1] = total;
  }
  fclose(in);
  return total;
}

}  // extern "C"

extern "C" {

// Fused parse + aggregate + window + DRACH-filter for a batch of read slices.
//
// For each read: aggregate events per position (as ea_combine_batch), then
// emit one window per position that (a) has `w` consecutive neighbours on
// both sides and (b) whose center 5-mer is in the DRACH motif set.
//
// Inputs:
//   motifs     n_motifs * 5 bytes (the DRACH center set)
//   w          neighbour radius (window = 2w+1 positions)
// Outputs (caller-allocated, capacity cap windows):
//   out_pos     int64[cap]            window center positions (+2 shifted)
//   out_seq     uint8[cap*(5+2w)]     combined sequence context
//   out_feat    double[cap*3*(2w+1)]  (dwell, std, mean) per window position
//   out_bounds  int64[n_reads+1]      window-count prefix per read
//   out_npos    int64[n_reads]        aggregated position count per read
// Returns total windows, or -1 on I/O error, -2 on overflow.
long long ea_featurize_batch(const char* path, const int64_t* starts,
                             const int64_t* ends, int64_t n_reads,
                             const uint8_t* motifs, int64_t n_motifs,
                             int64_t w, int64_t* out_pos, uint8_t* out_seq,
                             double* out_feat, int64_t* out_bounds,
                             int64_t* out_npos, int64_t cap) {
  FILE* in = fopen(path, "rb");
  if (in == nullptr) return -1;

  const int64_t width = 2 * w + 1;
  const int64_t seq_len = 5 + 2 * w;

  std::vector<char> buf;
  long long total = 0;
  out_bounds[0] = 0;

  struct Acc {
    long long pos;
    char kmer[5];
    double w_sum, mean_sum, std_sum, dwell_sum;
  };
  std::vector<Acc> accs;

  auto is_drach = [&](const char* k) {
    for (int64_t m = 0; m < n_motifs; ++m) {
      if (memcmp(k, motifs + m * 5, 5) == 0) return true;
    }
    return false;
  };

  for (int64_t r = 0; r < n_reads; ++r) {
    int64_t len = ends[r] - starts[r];
    buf.resize(static_cast<size_t>(len));
    if (fseeko(in, starts[r], SEEK_SET) != 0 ||
        fread(buf.data(), 1, static_cast<size_t>(len), in) !=
            static_cast<size_t>(len)) {
      fclose(in);
      return -1;
    }
    accs.clear();

    const char* p = buf.data();
    const char* bend = buf.data() + len;
    while (p < bend) {
      const char* nl = static_cast<const char*>(
          memchr(p, '\n', static_cast<size_t>(bend - p)));
      const char* line_end = nl ? nl : bend;
      Field f[15];
      int nf = split_fields(p, line_end, f, 15);
      p = line_end + 1;
      if (nf < 15) continue;
      if (!field_eq(f[2], f[9])) continue;
      long long position = parse_ll(f[1]);
      double ev_mean = parse_double(f[6]);
      double ev_stdv = parse_double(f[7]);
      double ev_len = parse_double(f[8]);
      double wt = static_cast<double>(parse_ll(f[14]) - parse_ll(f[13]));

      Acc* acc = nullptr;
      if (!accs.empty() && accs.back().pos == position) {
        acc = &accs.back();
      } else {
        for (auto it = accs.rbegin(); it != accs.rend(); ++it) {
          if (it->pos == position) {
            acc = &*it;
            break;
          }
        }
      }
      if (acc == nullptr) {
        accs.push_back(Acc{position, {0, 0, 0, 0, 0}, 0.0, 0.0, 0.0, 0.0});
        acc = &accs.back();
        memcpy(acc->kmer, f[2].p, f[2].len < 5 ? f[2].len : 5);
      }
      acc->w_sum += wt;
      acc->mean_sum += ev_mean * wt;
      acc->std_sum += ev_stdv * wt;
      acc->dwell_sum += ev_len * wt;
    }

    std::sort(accs.begin(), accs.end(),
              [](const Acc& a, const Acc& b) { return a.pos < b.pos; });
    out_npos[r] = static_cast<int64_t>(accs.size());

    const int64_t n = static_cast<int64_t>(accs.size());
    for (int64_t i = w; i + w < n; ++i) {
      // consecutive span (positions are sorted unique)
      if (accs[i + w].pos - accs[i - w].pos != 2 * w) continue;
      if (!is_drach(accs[i].kmer)) continue;
      if (total >= cap) {
        fclose(in);
        return -2;
      }
      out_pos[total] = accs[i].pos + 2;
      uint8_t* seq = out_seq + total * seq_len;
      memcpy(seq, accs[i - w].kmer, 5);
      for (int64_t j = 1; j <= 2 * w; ++j) {
        seq[4 + j] = static_cast<uint8_t>(accs[i - w + j].kmer[4]);
      }
      double* feat = out_feat + total * 3 * width;
      for (int64_t j = 0; j < width; ++j) {
        const Acc& a = accs[i - w + j];
        feat[j * 3 + 0] = a.dwell_sum / a.w_sum;
        feat[j * 3 + 1] = a.std_sum / a.w_sum;
        feat[j * 3 + 2] = rint(a.mean_sum / a.w_sum * 10.0) / 10.0;
      }
      ++total;
    }
    out_bounds[r + 1] = total;
  }
  fclose(in);
  return total;
}

}  // extern "C"
