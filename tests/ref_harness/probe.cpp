// Probe: print reference get_minimizer results for sequences read from
// stdin (one "<seq> <m>" per line; k = len(seq)). Used to debug oracle
// parity. Links against the reference sources in-place.
#include <iostream>
#include <string>
#include "Kmers.hpp"

int main() {
    std::string s;
    int m;
    while (std::cin >> s >> m) {
        DecyclingSet dede(m);
        kint v = str2num(s);
        uint8_t pos;
        bool rev;
        uint64_t mini = get_minimizer(v, s.size(), pos, m, rev,
                                      ((uint64_t)1 << (2 * m)) - 1, &dede);
        std::cout << kmer2str(mini, m) << " pos=" << (int)pos
                  << " rev=" << rev << " canonized=" << canonized(v, s.size())
                  << "\n";
    }
    return 0;
}
