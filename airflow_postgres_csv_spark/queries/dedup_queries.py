"""(stub — populated in later milestones)"""
