// Native sequence-file ingest: parsing + JC pattern canonization + dedup.
//
// Mirrors the semantics of the reference's AlignmentProcessor
// (readSeqFile / processLocusAlignment / cannonizeJCpattern,
// src/AlignmentProcessor.c:468-1660) as a fresh C++ implementation:
//   * seq file: "<numLoci>" then per locus "<name> <n> <len>" + n
//     "<sample> <sequence>" records; samples matched by name, missing
//     samples are all-'N'
//   * each column is canonized under the 24 JC base permutations by the
//     greedy lowest-symbol rule over still-live permutations
//   * canonized patterns are deduplicated into a global pattern set with
//     per-locus (patternId, count) profiles; all-'N' columns are dropped
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).  The heavy loop
// (one column = numSamples chars x live-permutation scan) uses a 24-bit
// liveness mask and precomputed 24x16 map tables.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// canonized symbol order (reference src/AlignmentProcessor.c:61)
const char kSymbols[] = "TCAGYWKMSRVDBHN";
constexpr int kNumSymbols = 15;

int8_t sym_index[256];
uint8_t transforms[24][kNumSymbols];  // [perm][symbol] -> symbol
bool tables_ready = false;

void build_tables() {
  if (tables_ready) return;
  for (int i = 0; i < 256; i++) sym_index[i] = -1;
  for (int i = 0; i < kNumSymbols; i++)
    sym_index[(unsigned char)kSymbols[i]] = (int8_t)i;

  int perms[24][4];
  int idx = 0;
  int base[4] = {0, 1, 2, 3};
  // enumerate all permutations of {0,1,2,3}
  int p[4];
  for (int a = 0; a < 4; a++)
    for (int b = 0; b < 4; b++) {
      if (b == a) continue;
      for (int c = 0; c < 4; c++) {
        if (c == a || c == b) continue;
        int d = 6 - a - b - c;
        perms[idx][0] = a; perms[idx][1] = b;
        perms[idx][2] = c; perms[idx][3] = d;
        idx++;
      }
    }
  (void)base; (void)p;
  for (int t = 0; t < 24; t++) {
    for (int b = 0; b < 4; b++) {
      transforms[t][b] = (uint8_t)perms[t][b];
      // 3-way ambiguities at 10..13 follow the base permutation
      transforms[t][b + 10] = (uint8_t)(perms[t][b] + 10);
    }
    transforms[t][14] = 14;  // N
    for (int b1 = 0; b1 < 4; b1++) {
      for (int b2 = b1 + 1; b2 < 4; b2++) {
        int amb = 2 * b1 + b2 + 3;
        if (amb == 10) amb = 9;
        int m1 = perms[t][b1], m2 = perms[t][b2];
        if (m1 > m2) { int tmp = m1; m1 = m2; m2 = tmp; }
        int ambm = 2 * m1 + m2 + 3;
        if (ambm == 10) ambm = 9;
        transforms[t][amb] = (uint8_t)ambm;
      }
    }
  }
  tables_ready = true;
}

struct IngestResult {
  int num_loci = 0;
  int num_samples = 0;
  std::vector<std::string> patterns;           // canonized pattern strings
  std::vector<int32_t> profile_offsets;        // [num_loci + 1]
  std::vector<int32_t> profile_ids;            // concatenated pattern ids
  std::vector<int32_t> profile_counts;         // concatenated counts
  std::string error;
};

// greedy canonization of one column (chars already uppercased/normalized)
inline bool canonize(const char* col, int n, char* out, std::string* err) {
  uint32_t live = 0xFFFFFF;  // 24 live permutations
  for (int s = 0; s < n; s++) {
    int8_t sym = sym_index[(unsigned char)col[s]];
    if (sym < 0) {
      *err = std::string("illegal base symbol '") + col[s] + "'";
      return false;
    }
    int best = 100;
    uint32_t m = live;
    while (m) {
      int t = __builtin_ctz(m);
      m &= m - 1;
      int v = transforms[t][sym];
      if (v < best) best = v;
    }
    uint32_t keep = 0;
    m = live;
    while (m) {
      int t = __builtin_ctz(m);
      m &= m - 1;
      if (transforms[t][sym] == best) keep |= (1u << t);
    }
    live = keep;
    out[s] = kSymbols[best];
  }
  return true;
}

IngestResult* g_last = nullptr;

}  // namespace

extern "C" {

// Returns 0 on success.  sample_names: num_samples '\0'-separated names
// (empty string = reserved diploid second slot).  num_loci_limit <= 0
// means read all loci in the file.
int gphocs_ingest(const char* path, const char* sample_names,
                  int num_samples, int num_loci_limit) {
  build_tables();
  delete g_last;
  g_last = new IngestResult();
  IngestResult& R = *g_last;
  R.num_samples = num_samples;

  std::vector<std::string> names(num_samples);
  {
    const char* ptr = sample_names;
    for (int i = 0; i < num_samples; i++) {
      names[i] = ptr;
      ptr += names[i].size() + 1;
    }
  }
  std::unordered_map<std::string, int> name_idx;
  for (int i = 0; i < num_samples; i++)
    if (!names[i].empty()) name_idx[names[i]] = i;

  FILE* f = fopen(path, "r");
  if (!f) {
    R.error = "cannot open sequence file";
    return -1;
  }

  auto read_token = [&](std::string* out) -> bool {
    int c;
    out->clear();
    while ((c = fgetc(f)) != EOF && isspace(c)) {}
    if (c == EOF) return false;
    do {
      out->push_back((char)c);
    } while ((c = fgetc(f)) != EOF && !isspace(c));
    return true;
  };

  std::string tok;
  if (!read_token(&tok)) { R.error = "empty file"; fclose(f); return -1; }
  int num_loci = atoi(tok.c_str());
  if (num_loci_limit > 0 && num_loci_limit < num_loci)
    num_loci = num_loci_limit;
  R.num_loci = num_loci;
  R.profile_offsets.push_back(0);

  std::unordered_map<std::string, int32_t> pattern_index;
  std::vector<const char*> seq_ptr(num_samples);
  std::vector<std::string> seqs;
  std::string col(num_samples, 'N');
  std::string canon(num_samples, 'N');

  for (int locus = 0; locus < num_loci; locus++) {
    std::string lname, t_n, t_len;
    if (!read_token(&lname) || !read_token(&t_n) || !read_token(&t_len)) {
      R.error = "unexpected EOF at locus " + std::to_string(locus);
      fclose(f);
      return -1;
    }
    int nrec = atoi(t_n.c_str());
    long slen = atol(t_len.c_str());
    seqs.assign(nrec, std::string());
    for (int i = 0; i < num_samples; i++) seq_ptr[i] = nullptr;
    for (int r = 0; r < nrec; r++) {
      std::string sname;
      if (!read_token(&sname) || !read_token(&seqs[r])) {
        R.error = "unexpected EOF reading sequences of locus " +
                  std::to_string(locus);
        fclose(f);
        return -1;
      }
      if ((long)seqs[r].size() != slen) {
        R.error = "bad sequence length for sample " + sname + " in locus " +
                  std::to_string(locus);
        fclose(f);
        return -1;
      }
      // normalize: uppercase, U->T, '-'->N
      for (auto& ch : seqs[r]) {
        ch = (char)toupper((unsigned char)ch);
        if (ch == 'U') ch = 'T';
        if (ch == '-') ch = 'N';
      }
      auto it = name_idx.find(sname);
      if (it != name_idx.end()) seq_ptr[it->second] = seqs[r].c_str();
    }

    // per-locus profile accumulation (insertion order preserved)
    std::unordered_map<int32_t, int32_t> counts;
    std::vector<int32_t> order;
    for (long site = 0; site < slen; site++) {
      bool all_n = true;
      for (int s = 0; s < num_samples; s++) {
        char ch = seq_ptr[s] ? seq_ptr[s][site] : 'N';
        col[s] = ch;
        if (ch != 'N') all_n = false;
      }
      if (all_n) continue;  // reference drops all-missing columns
      if (!canonize(col.data(), num_samples, &canon[0], &R.error)) {
        R.error += " (locus " + std::to_string(locus) + ")";
        fclose(f);
        return -1;
      }
      auto ins = pattern_index.emplace(canon, (int32_t)R.patterns.size());
      if (ins.second) R.patterns.push_back(canon);
      int32_t pid = ins.first->second;
      auto cit = counts.find(pid);
      if (cit == counts.end()) {
        counts.emplace(pid, 1);
        order.push_back(pid);
      } else {
        cit->second++;
      }
    }
    for (int32_t pid : order) {
      R.profile_ids.push_back(pid);
      R.profile_counts.push_back(counts[pid]);
    }
    R.profile_offsets.push_back((int32_t)R.profile_ids.size());
  }
  fclose(f);
  return 0;
}

int gphocs_ingest_num_loci() { return g_last ? g_last->num_loci : -1; }
int gphocs_ingest_num_patterns() {
  return g_last ? (int)g_last->patterns.size() : -1;
}
int gphocs_ingest_profile_size() {
  return g_last ? (int)g_last->profile_ids.size() : -1;
}
const char* gphocs_ingest_error() {
  return g_last ? g_last->error.c_str() : "no ingest";
}

// copy-out accessors; buffers must be pre-sized by the caller
void gphocs_ingest_patterns(char* out) {  // [num_patterns * num_samples]
  for (size_t i = 0; i < g_last->patterns.size(); i++)
    memcpy(out + i * g_last->num_samples, g_last->patterns[i].data(),
           g_last->num_samples);
}
void gphocs_ingest_profiles(int32_t* offsets, int32_t* ids,
                            int32_t* counts) {
  memcpy(offsets, g_last->profile_offsets.data(),
         g_last->profile_offsets.size() * sizeof(int32_t));
  memcpy(ids, g_last->profile_ids.data(),
         g_last->profile_ids.size() * sizeof(int32_t));
  memcpy(counts, g_last->profile_counts.data(),
         g_last->profile_counts.size() * sizeof(int32_t));
}
void gphocs_ingest_free() {
  delete g_last;
  g_last = nullptr;
}

}  // extern "C"
