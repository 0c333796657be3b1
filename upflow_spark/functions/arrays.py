"""(stub — filled in by build waves)"""
