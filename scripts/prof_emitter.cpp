// gprof driver for the native emitter's hot loops: runs se_scan on a
// dense corpus file for one mission config so `gprof` can attribute
// scan time per function. Build+run:
//   g++ -O2 -pg -fno-inline -std=c++17 -DSE_PROF_MAIN \
//       scripts/prof_emitter.cpp -o /tmp/prof_emitter
//   /tmp/prof_emitter /tmp/dense_r1.bin utf8   # writes gmon.out
//   gprof /tmp/prof_emitter gmon.out | head -40
// (-fno-inline keeps the static inline classifiers visible; for real
// timing use the normal -O3 build, this is attribution only.)

#include "../stringsext_tpu/native/emitter.cpp"

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s FILE utf8|utf16le|sbyte\n", argv[0]); return 2; }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    fseek(f, 0, SEEK_END); long total = ftell(f); fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data(total);
    if (fread(data.data(), 1, total, f) != (size_t)total) return 1;
    fclose(f);

    se_mission sm{};
    sm.af_lo = 0xffffffff00000000ull;
    sm.af_hi = 0x7fffffffffffffffull;
    sm.ubf = 0xfffffffcull;
    sm.grep_char = -1;
    sm.chars_min_nb = 4;
    sm.line_max = 16;
    sm.same_block = 0;
    sm.counter_offset = 0;
    std::string kind = argv[2];
    std::vector<int32_t> table256(256);
    if (kind == "utf8") sm.kind = 0;
    else if (kind == "utf16le") sm.kind = 1;
    else if (kind == "ascii") {
        // the ascii mission: x-user-defined table + default AF
        sm.kind = 3;
        for (int i = 0; i < 256; i++)
            table256[i] = i < 0x80 ? i : 0xF780 + i - 0x80;
        sm.ubf = 0;  // ascii emulation rejects all multibyte
        sm.line_max = 64;
        sm.table256 = table256.data();
    }
    else {
        sm.kind = 3;
        for (int i = 0; i < 256; i++) table256[i] = i < 0xA0 ? i : -1;
        sm.table256 = table256.data();
    }

    long nsl = (total + 4095) / 4096;
    std::vector<int64_t> starts(nsl);
    std::vector<int32_t> lens(nsl), fids(nsl, -1);
    std::vector<uint8_t> last(nsl, 0);
    for (long i = 0; i < nsl; i++) {
        starts[i] = i * 4096;
        lens[i] = (int32_t)((i == nsl - 1) ? total - starts[i] : 4096);
    }
    last[nsl - 1] = 1;

    int64_t cnt, sblen;
    const uint64_t* pos; const int8_t* prec; const uint8_t* comp;
    const int32_t* fid; const uint64_t* soff; const uint32_t* slen;
    const uint8_t* sbuf;
    void* h = se_scan(data.data(), total, starts.data(), lens.data(),
                      fids.data(), last.data(), nsl, &sm,
                      nullptr, nullptr, nullptr, 0,
                      nullptr, nullptr, 0,
                      nullptr, nullptr, nullptr, nullptr, nullptr,
                      nullptr, 0,
                      &cnt, &pos, &prec, &comp, &fid, &soff, &slen,
                      &sbuf, &sblen);
    printf("findings: %lld strbuf: %lld\n", (long long)cnt, (long long)sblen);
    se_free(h);
    return 0;
}
