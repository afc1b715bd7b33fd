// Native host-side helpers for masa_tpu: FASTA loading and the
// stage-5 constrained DP + traceback (the parts the reference implements
// in C++: biology/SequenceData.cpp and stage5/sw_stage5.cpp).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//
// State algebra matches ops/smallsw.py: a crosspoint pins the path to a
// DP state (0=H/MATCH, 1=E/GAP_1 horizontal, 2=F/GAP_2 vertical); gap
// state seeds are free to close (H(0,0)=0 always).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t NEG = -999999999LL;

inline int64_t max2(int64_t a, int64_t b) { return a > b ? a : b; }
inline int64_t max3(int64_t a, int64_t b, int64_t c) {
  return max2(max2(a, b), c);
}

}  // namespace

extern "C" {

// Parse a single-record FASTA file: uppercased residues into out
// (capacity cap), description into desc (capacity desc_cap).  Returns the
// residue count, or -1 on error.
long long masa_load_fasta(const char* path, unsigned char* out,
                          long long cap, char* desc, long long desc_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  desc[0] = '\0';
  long long n = 0;
  std::vector<char> buf(1 << 20);
  bool first_line = true;
  bool in_header = false;
  long long dlen = 0;
  size_t got;
  while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t k = 0; k < got; k++) {
      char c = buf[k];
      if (first_line && c == '>') {
        in_header = true;
        first_line = false;
        continue;
      }
      first_line = false;
      if (in_header) {
        if (c == '\n') {
          in_header = false;
          desc[dlen] = '\0';
        } else if (dlen + 1 < desc_cap && c != '\r') {
          desc[dlen++] = c;
        }
        continue;
      }
      if ((unsigned char)c > 32) {
        if (n >= cap) { fclose(f); return -1; }
        out[n++] = (unsigned char)std::toupper((unsigned char)c);
      }
    }
  }
  // trim trailing header whitespace
  while (dlen > 0 && isspace((unsigned char)desc[dlen - 1])) {
    desc[--dlen] = '\0';
  }
  fclose(f);
  return n;
}

// Constrained DP + traceback for one partition.
// ops_out layout: [count, code0, len0, code1, len1, ...]; codes:
//   0 = diagonal run, 1 = up (gap chars in seq1), 2 = left (gap in seq0),
//   bit 2 (value 4) marks the gap run as opened (charges gap_open).
// Runs are emitted in FORWARD path order.  Returns the segment score or
// -(1<<62) on failure.
long long masa_traceback(const unsigned char* seq0, long long h,
                         const unsigned char* seq1, long long w,
                         int type_s, int type_e,
                         int match, int mismatch, int gap_open,
                         int gap_ext,
                         int* ops_out, long long ops_cap) {
  const long long FAIL = -(1LL << 62);
  const int64_t go = gap_open, ge = gap_ext;
  const long long W1 = w + 1;
  std::vector<int64_t> H((h + 1) * W1), E((h + 1) * W1), F((h + 1) * W1);
  auto idx = [W1](long long i, long long j) { return i * W1 + j; };

  H[idx(0, 0)] = 0;
  E[idx(0, 0)] = (type_s == 1) ? 0 : NEG;
  F[idx(0, 0)] = (type_s == 2) ? 0 : NEG;
  for (long long j = 1; j <= w; j++) {
    E[idx(0, j)] = max2(H[idx(0, j - 1)] - go, E[idx(0, j - 1)]) - ge;
    H[idx(0, j)] = E[idx(0, j)];
    F[idx(0, j)] = NEG;
  }
  for (long long i = 1; i <= h; i++) {
    F[idx(i, 0)] = max2(H[idx(i - 1, 0)] - go, F[idx(i - 1, 0)]) - ge;
    H[idx(i, 0)] = F[idx(i, 0)];
    E[idx(i, 0)] = NEG;
    const unsigned char c0 = seq0[i - 1];
    const int64_t* Hp = &H[idx(i - 1, 0)];
    const int64_t* Fp = &F[idx(i - 1, 0)];
    int64_t* Hc = &H[idx(i, 0)];
    int64_t* Ec = &E[idx(i, 0)];
    int64_t* Fc = &F[idx(i, 0)];
    for (long long j = 1; j <= w; j++) {
      Ec[j] = max2(Hc[j - 1] - go, Ec[j - 1]) - ge;
      Fc[j] = max2(Hp[j] - go, Fp[j]) - ge;
      int64_t s = (c0 == seq1[j - 1]) ? match : mismatch;
      Hc[j] = max3(Hp[j - 1] + s, Ec[j], Fc[j]);
    }
  }

  long long seg;
  if (type_e == 1) seg = E[idx(h, w)];
  else if (type_e == 2) seg = F[idx(h, w)];
  else seg = H[idx(h, w)];

  // traceback (reverse order), run-length compressed
  std::vector<int> rcodes;
  std::vector<int> rlens;
  auto push = [&](int code) {
    if (!rcodes.empty() && rcodes.back() == code) {
      rlens.back()++;
    } else {
      rcodes.push_back(code);
      rlens.push_back(1);
    }
  };
  long long i = h, j = w;
  int state = type_e;
  while (i > 0 || j > 0) {
    if (state == 0) {
      int64_t s = (i > 0 && j > 0 &&
                   seq0[i - 1] == seq1[j - 1]) ? match : mismatch;
      if (i > 0 && j > 0 && H[idx(i, j)] == H[idx(i - 1, j - 1)] + s) {
        push(0);
        i--; j--;
        continue;
      }
      if (H[idx(i, j)] == E[idx(i, j)]) { state = 1; continue; }
      if (H[idx(i, j)] == F[idx(i, j)]) { state = 2; continue; }
      return FAIL;
    }
    if (state == 1) {
      if (j <= 0) return FAIL;
      bool opened = E[idx(i, j)] == H[idx(i, j - 1)] - go - ge;
      push(opened ? 6 : 2);
      j--;
      if (opened) state = 0;
      continue;
    }
    if (i <= 0) return FAIL;
    bool opened = F[idx(i, j)] == H[idx(i - 1, j)] - go - ge;
    push(opened ? 5 : 1);
    i--;
    if (opened) state = 0;
  }
  // Arriving in H state is always legal: H(0,0)=0 is the free closure of
  // a pinned gap state (see ops/smallsw.py).
  if (state != type_s && state != 0) return FAIL;

  long long count = (long long)rcodes.size();
  if (1 + 2 * count > ops_cap) return FAIL;
  ops_out[0] = (int)count;
  for (long long k = 0; k < count; k++) {
    // reverse to forward order
    ops_out[1 + 2 * k] = rcodes[count - 1 - k];
    ops_out[2 + 2 * k] = rlens[count - 1 - k];
  }
  return seg;
}

}  // extern "C"
