// Minimal stand-in for ankerl::unordered_dense (the reference's
// `unordered_dense` git-submodule is empty in the snapshot). Backed by
// std::unordered_map, which provides the subset of the API the reference
// uses (operator[], count, begin/end, iterators) plus stable references.
// Only used to compile the reference counter for baseline measurement.
#pragma once
#include <cstdint>
#include <functional>
#include <unordered_map>

namespace ankerl {
namespace unordered_dense {

struct u128_hash {
    size_t operator()(__uint128_t v) const {
        return std::hash<uint64_t>()((uint64_t)v) ^
               (std::hash<uint64_t>()((uint64_t)(v >> 64)) * 0x9e3779b97f4a7c15ull);
    }
};

template <typename K, typename V>
using map = std::unordered_map<K, V, u128_hash>;

} // namespace unordered_dense
} // namespace ankerl
