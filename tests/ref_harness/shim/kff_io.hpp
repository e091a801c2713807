// Minimal no-op stand-in for the kff_io library (the reference's `kff`
// git-submodule is empty in the snapshot). Only the API surface touched by
// /root/reference/brisk/writer.hpp is declared; all methods are no-ops.
// This shim exists solely so the reference `counter` app can be compiled for
// baseline measurement without `-o` (KFF output) support.
#pragma once
#include <cstdint>
#include <string>

class Section_GV;
class Section_Minimizer;

class Kff_file {
public:
    Kff_file(const std::string &, const std::string &) {}
    void write_encoding(uint8_t, uint8_t, uint8_t, uint8_t) {}
    void write_metadata(uint64_t, uint8_t *) {}
    void close() {}
};

class Section_GV {
public:
    Section_GV(Kff_file *) {}
    void write_var(const std::string &, uint64_t) {}
    void close() {}
};

class Section_Minimizer {
public:
    Section_Minimizer(Kff_file *) {}
    void write_minimizer(uint8_t *) {}
    void write_compacted_sequence_without_mini(uint8_t *, uint64_t, uint64_t,
                                               uint8_t *) {}
    void close() {}
};
