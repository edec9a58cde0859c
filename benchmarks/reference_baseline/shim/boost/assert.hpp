#pragma once
#include <cassert>
#ifndef BOOST_ASSERT_MSG
#define BOOST_ASSERT_MSG(cond, msg) assert((cond))
#endif
#ifndef BOOST_ASSERT
#define BOOST_ASSERT(cond) assert((cond))
#endif
