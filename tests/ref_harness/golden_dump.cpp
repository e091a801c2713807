// Golden-count generator: links against the REFERENCE sources at
// /root/reference/brisk (Kmers.cpp, hashing.cpp, Decycling.cpp — compiled
// in-place, never copied) and reproduces exactly the mode-2 verification
// oracle of the reference counter app (counter.cpp:247-258): every k-mer
// emitted by SuperKmerEnumerator is counted (mod 256) keyed by its emitted
// value kmer_s. The reference's own mode-2 run proves the index contents
// equal this oracle, so this dump IS the golden per-k-mer count table.
//
// Usage: golden_dump <fasta> <k> <m> [--skmers]
// Output: one line per distinct k-mer: "<ACGT-string> <count>"
// With --skmers: additionally prints super-k-mer boundaries as
//   "S <minimizer-string> <n_kmers>" per enumerator emission (for enumerator
//   parity tests).
#include <cstdint>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <vector>

#include "Kmers.hpp"

// Read one FASTA record worth of cleaned sequence, reproducing
// counter.cpp getLineFasta/clean_dna semantics (truncate at first non-ACGT,
// resume after the invalid run on the next call, uppercase).
static std::string next_chunk(std::istream &in, std::string &pending) {
    std::string line, result;
    if (pending.empty()) {
        std::getline(in, line); // header or first line
        int c = in.peek();
        while (c != '>' && c != EOF) {
            std::getline(in, line);
            result += line;
            c = in.peek();
        }
    } else {
        result.swap(pending);
        pending.clear();
    }
    // clean: find first invalid char
    size_t i = 0;
    auto valid = [](char ch) {
        switch (ch) {
        case 'a': case 'A': case 'c': case 'C':
        case 'g': case 'G': case 't': case 'T': return true;
        default: return false;
        }
    };
    while (i < result.size() && valid(result[i])) i++;
    if (i < result.size()) {
        size_t j = i;
        while (j < result.size() && !valid(result[j])) j++;
        if (j < result.size()) pending = result.substr(j);
        result = result.substr(0, i);
    }
    for (auto &ch : result) ch = (char)toupper(ch);
    return result;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        std::cerr << "usage: golden_dump <fasta> <k> <m> [--skmers]\n";
        return 1;
    }
    std::string path = argv[1];
    int k = atoi(argv[2]);
    int m = atoi(argv[3]);
    bool dump_skmers = argc > 4 && std::string(argv[4]) == "--skmers";

    DecyclingSet *dede = new DecyclingSet(m);
    std::map<std::string, long> counts; // string key => deterministic order

    std::ifstream in(path);
    if (!in) { std::cerr << "cannot open " << path << "\n"; return 1; }
    std::string pending;
    uint64_t total = 0, n_skmers = 0;
    while (in.good() || !pending.empty()) {
        std::string seq = next_chunk(in, pending);
        if ((int)seq.size() < k) continue;
        SuperKmerEnumerator enumerator(seq, k, m, dede);
        std::vector<kmer_full> kmers;
        while (true) {
            kmers.clear();
            enumerator.next(kmers);
            if (kmers.empty()) break;
            n_skmers++;
            if (dump_skmers) {
                std::cout << "S " << kmer2str(kmers[0].minimizer, m) << " "
                          << kmers.size() << "\n";
            }
            for (auto &km : kmers) {
                counts[kmer2str(km.kmer_s, k)] =
                    (counts[kmer2str(km.kmer_s, k)] + 1) % 256;
                total++;
            }
        }
    }
    std::cout << "# total " << total << " distinct " << counts.size()
              << " skmer_emissions " << n_skmers << "\n";
    for (auto &kv : counts)
        std::cout << kv.first << " " << kv.second << "\n";
    return 0;
}
