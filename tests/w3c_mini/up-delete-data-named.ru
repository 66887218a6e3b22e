PREFIX : <http://example/>
DELETE DATA { GRAPH :g1 { :s1 :q :x1 } }
