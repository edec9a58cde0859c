#pragma once
#include <iostream>
#define BOOST_LOG_TRIVIAL(sev) (::std::cerr << "\n[" << #sev << "] ")
